"""Device-mesh utilities: data-parallel sharding over ICI via GSPMD
(SURVEY.md §2.10 — the TPU-native replacement for nn.DataParallel)."""
from .mesh import make_mesh, batch_sharding, replicate_sharding, shard_batch  # noqa: F401
