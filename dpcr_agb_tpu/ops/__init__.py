"""Device-side compute primitives (JAX/XLA/Pallas) for point clouds and
sparse voxel grids — fixed shapes everywhere, mask-based validity."""
