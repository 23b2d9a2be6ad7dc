from .engine import (Cfg, MISSING, MissingMandatoryValue,
                     compose_from_checkpoint, load_config, parse_overrides)

__all__ = ["Cfg", "MISSING", "MissingMandatoryValue", "compose_from_checkpoint",
           "load_config", "parse_overrides"]
