from .batch import Batch, CollateSpec, PAD_COORD, bucket_size, collate
from .dataset import Las, LasDataset, RandomSampler, instantiate_dataset
from .loader import Loader
from .las_io import read_las, read_pt, write_las
from .synthetic import generate_nfi_like_dataset, generate_plot

__all__ = [
    "Batch", "CollateSpec", "PAD_COORD", "bucket_size", "collate",
    "Las", "LasDataset", "RandomSampler", "instantiate_dataset", "Loader",
    "read_las", "read_pt", "write_las",
    "generate_nfi_like_dataset", "generate_plot",
]
