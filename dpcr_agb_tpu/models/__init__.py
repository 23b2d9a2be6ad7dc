"""Task models. `instantiate_model(cfg, dataset)` mirrors the reference's
model factory (models/model_factory.py:7-44): config-driven lookup by
model_name within the selected model group."""
from .base import InstanceSpec, build_instance_spec, compute_reg_loss, reg_output  # noqa: F401
from .factory import instantiate_model, ModelBundle  # noqa: F401
