"""TPU-native framework for efficient and phase-aware video super-resolution of
cardiac MRI (JAX / XLA / Pallas / pjit rebuild).

This is a from-scratch, TPU-first reimplementation of the capabilities of the
reference PyTorch framework (Lin et al., MICCAI 2020, arXiv:2005.10626):
config-driven SISR / MISR / VSR experiments on the ACDC and DSB15 cardiac
cine-MRI datasets, with the phase-aware RefineNet as the flagship model.

Design stance (see SURVEY.md §7):
  * pure functions + pytrees (Flax linen) instead of mutable nn.Modules
  * ``lax.scan`` over time instead of Python frame loops
  * one jitted, sharded train step instead of per-tensor device copies
  * data-parallel over a ``jax.sharding.Mesh`` with psum gradient all-reduce
  * Pallas kernels for the hot fused ops (LSTM gates, deformable conv gather)

The package intentionally keeps the reference's YAML config surface
(``configs/train|test/**.yaml`` run unchanged) while replacing every layer
underneath with a TPU-idiomatic design.
"""

__version__ = "0.1.0"

# Short import alias used throughout docs/tests:
#   import efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu as evsr
