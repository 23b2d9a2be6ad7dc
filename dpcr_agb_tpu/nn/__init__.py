"""Neural-net building blocks (flax.linen) shared by all models."""
from .blocks import ACTIVATIONS, DropPath, SELayer, SeparateLinear  # noqa: F401
from .norm import MaskedBatchNorm, MaskedLayerNorm  # noqa: F401
