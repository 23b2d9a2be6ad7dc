from .core import (Compose, Sample, TRANSFORM_REGISTRY, Transform, apply_index,
                   apply_mask, instantiate_transform, instantiate_transforms,
                   num_points, register, shuffle_sample)
from . import transforms as _transforms  # noqa: F401 (registration)
from . import features as _features  # noqa: F401
from . import grid as _grid  # noqa: F401
from . import filters as _filters  # noqa: F401
from . import objects as _objects  # noqa: F401
from . import feature_augment as _feature_augment  # noqa: F401
from . import inference as _inference  # noqa: F401
from .inference import ModelInference, PointNetForward  # noqa: F401

from .transforms import *  # noqa: F401,F403
from .features import *  # noqa: F401,F403
from .feature_augment import (ChromaticAutoContrast, ChromaticJitter,  # noqa: F401
                              ChromaticTranslation, DropFeature, Jitter,
                              NormalizeRGB)
from .grid import GridSampling3D, RandomCoordsFlip, SaveOriginalPosId, ShiftVoxels
from .filters import ClassificationFilter, FCompose, PlanarityFilter, RandomFilter

__all__ = [
    "Compose", "Sample", "TRANSFORM_REGISTRY", "Transform", "apply_index",
    "apply_mask", "instantiate_transform", "instantiate_transforms",
    "num_points", "register", "shuffle_sample",
]
