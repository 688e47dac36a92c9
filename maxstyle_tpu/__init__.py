"""maxstyle_tpu — a TPU-native (JAX/Flax/Pallas) framework for robust medical
image segmentation with adversarial style composition.

Re-designed from scratch with the capability set of the MaxStyle reference
(MICCAI 2022, "MaxStyle: Adversarial Style Composition for Robust Medical
Image Segmentation"): dual-branch encoder/decoder segmentation +
reconstruction networks, feature-style-space data augmentation (MaxStyle,
MixStyle, DSU), latent-space masking (LSM/RSC), pixel-space augmentation
(RandConv, adversarial noise/bias), a volumetric OOD evaluation harness and a
full training driver — all built TPU-first:

* NHWC layout, static shapes, bfloat16-friendly compute for the MXU.
* The entire training step — including the 5-step inner adversarial style
  optimization — compiles to a single XLA program (`jax.jit` + `lax.scan`).
* Batch ("data") sharding over a `jax.sharding.Mesh`; XLA collectives over
  ICI replace any host-side coordination.
* A fused Pallas kernel for the MaxStyle hot path (instance-stat extraction,
  style mixing, noise injection) with a custom VJP matching the reference's
  detached-statistics autograd semantics.
"""

__version__ = "0.1.0"

from maxstyle_tpu import losses  # noqa: F401
from maxstyle_tpu import prng  # noqa: F401
