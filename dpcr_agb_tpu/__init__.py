"""dpcr_agb_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for deep point-cloud
regression of above-ground forest biomass, with the capabilities of the reference
torch-points3d fork (StefOe/DPCR-AGB, surveyed in /root/repo/SURVEY.md).

Design pillars (TPU-first, not a port):
  * fixed-shape padded point/voxel/neighbor tensors everywhere — XLA traces once
  * pure-functional transforms with explicit PRNG keys
  * sparse-voxel and kernel-point convolutions as gather-matmul kernels on the MXU
  * optax training loop jitted over a `jax.sharding.Mesh` (data parallel over ICI)
"""

__version__ = "0.1.0"

import os as _os

# Backend pin for subprocess-driven tooling (run_trials / size experiment /
# CI smokes): some images force the accelerator platform in sitecustomize
# and ignore JAX_PLATFORMS, so an env-var pin must be applied through
# jax.config BEFORE the backend initializes. Importing this package is the
# first thing every CLI does, which makes this the one shared hook.
# No-op unless DPCR_PLATFORM is set.
_plat = _os.environ.get("DPCR_PLATFORM")
if _plat:
    import jax as _jax
    _jax.config.update("jax_platforms", _plat)
