from .engine import Cfg, MISSING, MissingMandatoryValue, load_config, parse_overrides

__all__ = ["Cfg", "MISSING", "MissingMandatoryValue", "load_config", "parse_overrides"]
