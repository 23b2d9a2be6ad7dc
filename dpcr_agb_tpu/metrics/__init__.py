from .meters import APPRXMeter, AverageValueMeter, MAEMeter, MSEMeter, R2Meter
from .base_tracker import BaseTracker
from .instance_tracker import InstanceTracker, TrackerSpec

__all__ = [
    "APPRXMeter", "AverageValueMeter", "MAEMeter", "MSEMeter", "R2Meter",
    "BaseTracker", "InstanceTracker", "TrackerSpec",
]
