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
