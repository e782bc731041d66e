from . import native
from .profiling import phase_timer, device_trace, timed_slope
