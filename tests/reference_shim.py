"""Import the reference's OWN executable PyTorch code on this host.

VERDICT r2 "missing #1": branch-level loss parity was previously validated
against builder-authored torch re-derivations. This shim makes the actual
reference solver (/root/reference/src/models/advanced_triplet_recon_
segmentation_model.py) importable so tests can pin our losses against the
reference's own execution.

The reference's import graph drags in packages absent from this image
(torchvision, monai, SimpleITK, skimage, torchsample) plus numpy-1.x-only
module paths. None of those are touched by the solver paths under test
(FCN-family networks, losses, latent masking, MaxStyle/MixStyle); we install
minimal stub modules so the imports resolve, and fail loudly if a stubbed
symbol is actually exercised.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"

_loaded = {}


class _AnyAttrModule(types.ModuleType):
    """Stub module: any attribute access yields a placeholder that raises
    only if called/instantiated."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)

        class _Unusable:
            _stub_name = f"{self.__name__}.{name}"

            def __init__(self, *a, **k):
                raise RuntimeError(
                    f"reference shim: {self._stub_name} is a stub and must "
                    f"not be instantiated by parity tests")

            def __call__(self, *a, **k):
                raise RuntimeError(
                    f"reference shim: {self._stub_name} is a stub")

        _Unusable.__name__ = name
        setattr(self, name, _Unusable)
        return _Unusable


def _stub(name, cls=types.ModuleType, **attrs):
    m = cls(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_shims():
    """Idempotently install import shims for the reference's missing deps."""
    import collections
    import collections.abc

    import numpy as np

    # py3.12 removed the collections.* ABC aliases the reference still uses
    if not hasattr(collections, "MutableMapping"):
        collections.MutableMapping = collections.abc.MutableMapping
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable

    if "numpy.lib.function_base" not in sys.modules:
        _stub("numpy.lib.function_base", copy=np.copy)
    if "numpy.core.fromnumeric" not in sys.modules:
        _stub("numpy.core.fromnumeric", shape=np.shape)

    for name in ("torchvision", "torchvision.models", "SimpleITK",
                 "torchsample", "torchsample.transforms",
                 "skimage", "skimage.measure", "skimage.exposure",
                 "skimage.transform", "skimage.morphology",
                 "medpy", "medpy.metric", "medpy.metric.binary",
                 "monai", "monai.networks", "monai.networks.blocks",
                 "monai.networks.blocks.dynunet_block",
                 "monai.networks.blocks.unetr_block",
                 "monai.networks.nets", "monai.networks.nets.vit",
                 "monai.utils"):
        try:
            __import__(name)
        except ImportError:
            _stub(name, _AnyAttrModule)
    # parent-module attribute links for stubbed packages
    for parent, child in (("torchvision", "models"),
                          ("monai", "networks"),
                          ("monai.networks", "blocks"),
                          ("monai.networks.blocks", "dynunet_block"),
                          ("monai.networks.blocks", "unetr_block"),
                          ("monai.networks", "nets"),
                          ("monai.networks.nets", "vit"),
                          ("monai", "utils"),
                          ("skimage", "measure"), ("skimage", "exposure"),
                          ("skimage", "transform"), ("skimage", "morphology"),
                          ("medpy", "metric"), ("medpy.metric", "binary")):
        if parent in sys.modules and child.split(".")[-1] not in vars(sys.modules[parent]):
            full = f"{parent}.{child}"
            if full in sys.modules:
                setattr(sys.modules[parent], child, sys.modules[full])


def reference_module(dotted: str):
    """Import and cache a module from the reference tree, e.g.
    'src.models.advanced_triplet_recon_segmentation_model'."""
    if dotted in _loaded:
        return _loaded[dotted]
    install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    mod = __import__(dotted, fromlist=["_"])
    _loaded[dotted] = mod
    return mod


def reference_solver_class():
    return reference_module(
        "src.models.advanced_triplet_recon_segmentation_model"
    ).AdvancedTripletReconSegmentationModel
