"""Pairwise binary-segmentation measures — the niftynet-style API surface.

≙ common_utils/hausdorff_util.PairwiseMeasures:14-612 (border maps, 95% HD,
overlap/volume statistics) — off the main evaluation path (SURVEY §2.6); a
thin class exposing the measure functions of maxstyle_tpu.metrics under the
familiar method names.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from scipy import ndimage

from maxstyle_tpu import metrics


class PairwiseMeasures:
    def __init__(self, seg: np.ndarray, ref: np.ndarray,
                 pixdim: Optional[Sequence[float]] = None):
        self.seg = np.asarray(seg).astype(bool)
        self.ref = np.asarray(ref).astype(bool)
        self.pixdim = tuple(pixdim) if pixdim is not None else None

    # --- border / distance ------------------------------------------------
    def border_map(self, binary: np.ndarray) -> np.ndarray:
        conn = ndimage.generate_binary_structure(binary.ndim, 1)
        return binary ^ ndimage.binary_erosion(binary, conn)

    def measured_hausdorff_distance(self) -> float:
        return metrics.hausdorff_distance(self.seg, self.ref, self.pixdim)

    def measured_hausdorff_distance_95(self) -> float:
        return metrics.hd95(self.seg, self.ref, self.pixdim)

    def measured_average_distance(self) -> float:
        return metrics.assd(self.seg, self.ref, self.pixdim)

    # --- overlap ----------------------------------------------------------
    def dice_score(self) -> float:
        return metrics.dice(self.seg, self.ref)

    def jaccard(self) -> float:
        return metrics.jaccard(self.seg, self.ref)

    def sensitivity(self) -> float:
        return metrics.sensitivity(self.seg, self.ref)

    def specificity(self) -> float:
        return metrics.specificity(self.seg, self.ref)

    def precision(self) -> float:
        return metrics.precision(self.seg, self.ref)

    # --- volume -----------------------------------------------------------
    def vol_diff(self) -> float:
        vr = np.count_nonzero(self.ref)
        return abs(np.count_nonzero(self.seg) - vr) / vr if vr else np.nan

    def relative_volume_difference(self) -> float:
        return metrics.ravd(self.seg, self.ref)

    def to_dict(self) -> dict:
        return {
            "dice": self.dice_score(), "jaccard": self.jaccard(),
            "sensitivity": self.sensitivity(),
            "specificity": self.specificity(), "precision": self.precision(),
            "hd": self.measured_hausdorff_distance(),
            "hd95": self.measured_hausdorff_distance_95(),
            "assd": self.measured_average_distance(),
            "vol_diff": self.vol_diff(),
        }
