"""2D-slice datasets over 3D medical volumes (host side, TPU-feeding).

Redesign of /root/reference/src/dataset_loader/base_segmentation_dataset.py
(:20-392), cardiac_ACDC_dataset.py (:42-190), prostate_Decathlon_dataset.py
(:38-213) and cardiac_general_dataset.py (:35-260) with a different split of
labor: the host side only scans, loads, resamples, label-remaps, pads and
caches RAW slices; ALL stochastic augmentation + normalization runs batched
on device (data/augment.py). This removes the reference's per-slice CPU
torchsample pipeline from the input path entirely — the host loop is pure
memory traffic.

Key behaviors carried over:
* format-string file layout ({pid}_img.nrrd / {pid}/t2_img_clipped.nii.gz…)
* black-slice exclusion from the slice index (ignore_black_slice;
  base_segmentation_dataset.py:248-299 re-rolls, we simply drop)
* label formalization via idx2cls -> formalized dict remapping (:302-314),
  plus binary / myocardium-only / right-ventricle-only reductions
* per-volume RAM cache with LRU bound (the `Cache` of data_structure.py:4-39)
* volumetric test access with crop-or-pad + per-slice min-max norm
  (get_patient_data_for_testing :337-371)
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from maxstyle_tpu.data import medio
from maxstyle_tpu.data.splits import acdc_split, prostate_split


class LRUVolumeCache:
    def __init__(self, maxlen: int = 20):
        self.maxlen = maxlen
        self._d: OrderedDict = OrderedDict()

    def get(self, key):
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        return None

    def put(self, key, value):
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.maxlen:
            self._d.popitem(last=False)


def remap_labels(label: np.ndarray, label_map: Optional[Dict[int, int]] = None,
                 binary: bool = False, myocardium_only: bool = False,
                 right_ventricle_only: bool = False) -> np.ndarray:
    out = label.astype(np.int32)
    if label_map:
        remapped = np.zeros_like(out)
        for src, dst in label_map.items():
            remapped[out == src] = dst
        out = remapped
    if binary:
        out = (out > 0).astype(np.int32)
    elif myocardium_only:
        out = (out == 2).astype(np.int32)
    elif right_ventricle_only:
        out = (out == 3).astype(np.int32)
    return out


class SliceDataset:
    """Slice-indexed view over a set of (image, label) volumes."""

    def __init__(self, root_dir: str, patient_ids: Sequence[str],
                 image_format_name: str, label_format_name: str,
                 pad_hw: Tuple[int, int] = (224, 224),
                 crop_hw: Tuple[int, int] = (192, 192),
                 new_spacing: Optional[Sequence[float]] = None,
                 label_map: Optional[Dict[int, int]] = None,
                 binary: bool = False, myocardium_only: bool = False,
                 right_ventricle_only: bool = False,
                 ignore_black_slice: bool = True,
                 cache_volumes: int = 20,
                 disk_cache_dir: Optional[str] = None,
                 dataset_name: str = ""):
        self.root_dir = root_dir
        self.dataset_name = dataset_name
        self.image_format_name = image_format_name
        self.label_format_name = label_format_name
        self.pad_hw = tuple(pad_hw)
        self.crop_hw = tuple(crop_hw)
        self.new_spacing = tuple(new_spacing) if new_spacing else None
        self.label_kwargs = dict(label_map=label_map, binary=binary,
                                 myocardium_only=myocardium_only,
                                 right_ventricle_only=right_ventricle_only)
        self.ignore_black_slice = ignore_black_slice
        self._cache = LRUVolumeCache(cache_volumes)
        # optional on-disk cache of resampled/remapped volumes — the
        # counterpart of the reference's ./log/cache scan pickles
        # (cardiac_ACDC_dataset.py:109-176)
        self.disk_cache_dir = disk_cache_dir
        if disk_cache_dir:
            os.makedirs(disk_cache_dir, exist_ok=True)
        self.patient_ids: List[str] = []
        self.slice_index: List[Tuple[str, int]] = []  # (pid, slice)
        self.pid_spacing: Dict[str, Tuple[float, ...]] = {}
        self._scan(list(patient_ids))

    # -- file access ----------------------------------------------------

    def _paths(self, pid: str) -> Tuple[str, str]:
        return (os.path.join(self.root_dir, self.image_format_name.format(pid=pid, p_id=pid)),
                os.path.join(self.root_dir, self.label_format_name.format(pid=pid, p_id=pid)))

    def _disk_cache_path(self, pid: str) -> Optional[str]:
        if not self.disk_cache_dir:
            return None
        safe = pid.replace("/", "_")
        return os.path.join(self.disk_cache_dir,
                            f"{self.dataset_name}_{safe}.npz")

    def _load_volume(self, pid: str):
        cached = self._cache.get(pid)
        if cached is not None:
            return cached
        dpath = self._disk_cache_path(pid)
        if dpath and os.path.exists(dpath):
            z = np.load(dpath)
            entry = (z["img"], z["lab"], tuple(z["spacing"]))
            self._cache.put(pid, entry)
            return entry
        img_path, lab_path = self._paths(pid)
        img, spacing = medio.read_volume(img_path)
        lab, _ = medio.read_volume(lab_path)
        img = img.astype(np.float32)
        lab = remap_labels(lab, **self.label_kwargs)
        if self.new_spacing is not None:
            src_spacing = spacing
            img, spacing = medio.resample_by_spacing(img, src_spacing, self.new_spacing)
            lab, _ = medio.resample_by_spacing(lab, src_spacing, self.new_spacing,
                                               label=True)
        entry = (img, lab, spacing)
        if dpath:
            np.savez_compressed(dpath, img=img, lab=lab,
                                spacing=np.asarray(spacing))
        self._cache.put(pid, entry)
        return entry

    def _scan(self, patient_ids: Sequence[str]):
        for pid in patient_ids:
            img_path, lab_path = self._paths(pid)
            if not (os.path.exists(img_path) and os.path.exists(lab_path)):
                continue
            try:
                img, lab, spacing = self._load_volume(pid)
            except (ValueError, OSError) as e:
                print(f"warning: failed to load {pid}: {e}")
                continue
            self.patient_ids.append(pid)
            self.pid_spacing[pid] = spacing
            for s in range(img.shape[0]):
                if self.ignore_black_slice and not np.any(lab[s]):
                    continue
                self.slice_index.append((pid, s))

    # -- training access -------------------------------------------------

    def __len__(self) -> int:
        return len(self.slice_index)

    def get_raw_slice(self, index: int) -> Tuple[np.ndarray, np.ndarray, str]:
        """Padded raw (image [H,W] float32, label [H,W] int32, pid) —
        normalization/augmentation happen on device."""
        from maxstyle_tpu import native
        pid, s = self.slice_index[index]
        img, lab, _ = self._load_volume(pid)
        image = native.crop_or_pad(img[s:s + 1].astype(np.float32), self.pad_hw)[0]
        label = native.crop_or_pad(lab[s:s + 1].astype(np.int32), self.pad_hw)[0]
        return image, label, pid

    # -- volumetric test access ------------------------------------------

    def get_patient_volume(self, pid: str, normalize_2d: bool = True):
        """(volume [S,h,w] float norm, label [S,h,w] int, spacing) at
        crop size (get_patient_data_for_testing:337-371)."""
        from maxstyle_tpu import native
        img, lab, spacing = self._load_volume(pid)
        img = native.crop_or_pad(img.astype(np.float32), self.crop_hw)
        lab = native.crop_or_pad(lab.astype(np.int32), self.crop_hw)
        if normalize_2d:
            img = native.minmax_norm_slices(img)
        return img.astype(np.float32), lab, spacing


class ConcatSliceDataset:
    """Concatenation of slice datasets (ED+ES frames;
    base_segmentation_dataset.ConcatDataSet:414-467)."""

    def __init__(self, datasets: Sequence[SliceDataset]):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def get_raw_slice(self, index: int):
        di = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[di].get_raw_slice(index - int(self._offsets[di]))

    @property
    def patient_ids(self):
        out = []
        for d in self.datasets:
            out.extend(d.patient_ids)
        return out


def build_acdc_dataset(root_dir: str, split: str, data_setting: str, cval: int,
                       frames=("ED", "ES"), image_format_name="{pid}_img.nrrd",
                       label_format_name="{pid}_seg.nrrd", pad_hw=(224, 224),
                       crop_hw=(192, 192), new_spacing=None, **kwargs):
    """ACDC per-frame datasets concatenated (cardiac_ACDC_dataset.py:42-190:
    file layout `{root}/{frame}/{pid}_img.nrrd`)."""
    policy = acdc_split(data_setting, cval)
    pids = policy[split]
    parts = []
    for frame in (frames if isinstance(frames, (list, tuple)) else [frames]):
        parts.append(SliceDataset(
            os.path.join(root_dir, frame), pids, image_format_name,
            label_format_name, pad_hw=pad_hw, crop_hw=crop_hw,
            new_spacing=new_spacing, dataset_name=f"ACDC_{frame}", **kwargs))
    return ConcatSliceDataset(parts) if len(parts) > 1 else parts[0]


def build_prostate_dataset(root_dir: str, split: str, data_setting: str,
                           cval: int,
                           image_format_name="{pid}/t2_img_clipped.nii.gz",
                           label_format_name="{pid}/label_clipped.nii.gz",
                           pad_hw=(224, 224), crop_hw=(192, 192),
                           new_spacing=None, **kwargs):
    all_ids = sorted(os.listdir(root_dir)) if os.path.isdir(root_dir) else []
    policy = prostate_split(all_ids, data_setting, cval)
    return SliceDataset(root_dir, policy[split], image_format_name,
                        label_format_name, pad_hw=pad_hw, crop_hw=crop_hw,
                        new_spacing=new_spacing, binary=True,
                        dataset_name="Prostate", **kwargs)


def build_general_dataset(root_dir: str, image_format_name: str,
                          label_format_name: str, pad_hw=(224, 224),
                          crop_hw=(192, 192), new_spacing=None, **kwargs):
    """Generic {pid}/format dataset for OOD test sites
    (cardiac_general_dataset.py:35-260)."""
    pids = sorted(os.listdir(root_dir)) if os.path.isdir(root_dir) else []
    return SliceDataset(root_dir, pids, image_format_name, label_format_name,
                        pad_hw=pad_hw, crop_hw=crop_hw, new_spacing=new_spacing,
                        **kwargs)


class HostBatchLoader:
    """Shuffled raw-slice batch iterator. Yields numpy dicts
    {'image' [N,H,W], 'label' [N,H,W]}; device-side augmentation turns these
    into the aug+orig training batches."""

    def __init__(self, dataset, batch_size: int, seed: Optional[int] = 0,
                 drop_last: bool = True, shuffle: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed if seed is not None else 0)
        self.drop_last = drop_last
        self.shuffle = shuffle

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n = len(order)
        stop = n - (n % self.batch_size) if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start:start + self.batch_size]
            images, labels = [], []
            for i in idx:
                img, lab, _ = self.dataset.get_raw_slice(int(i))
                images.append(img)
                labels.append(lab)
            yield {"image": np.stack(images), "label": np.stack(labels)}

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
