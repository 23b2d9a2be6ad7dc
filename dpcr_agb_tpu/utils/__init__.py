from .enums import ConvolutionFormat, SchedulerUpdateOn
from .colors import COLORS, colored_print, log

__all__ = ["ConvolutionFormat", "SchedulerUpdateOn", "COLORS", "colored_print", "log"]
