"""TPU-native framework for adversarial-patch *creation* (false-positive) attacks
against aerial-imagery object detectors.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch implementation (tang-agui/Adversarial_patch-based_false_positive_
creation_attacks_against_aerial_imagery_object_detectors):

- ``models``   darknet ``.cfg``-defined YOLOv3 victim detector as a pure
               functional JAX model (NHWC, BN-folded, MXU-friendly).
- ``ops``      differentiable building blocks: median pool, affine warp
               (PyTorch ``grid_sample`` parity), box decode, NMS.
- ``attack``   the EOT patch-transform stack, compositing, and creation
               losses (objectness/class cell extraction, NPS, TV,
               colorfulness) as jit-differentiable functions.
- ``train``    the patch optimization loop: one pjit'd
               ``jax.grad`` step, optax Adam(amsgrad) + plateau scheduler,
               orbax-style checkpointing.
- ``parallel`` device-mesh construction and shardings (data-parallel batch,
               replicated patch/detector params).
- ``data``     DOTA tile + YOLO label dataset, label I/O, assets.
- ``evals``    detection CLI path, creation metrics M1/M2/M4, mAP.
"""

__version__ = "0.1.0"

from . import attack, data, evals, models, ops, parallel, train, utils  # noqa: E402,F401

# Short alias so users don't have to type the full package name:
#   import adversarial_patch_based_..._tpu as apfp
