from .pipeline import BUF_SIZE, AsyncMultiMapper
from .timer import FpsMeter, Timer

__all__ = ["AsyncMultiMapper", "BUF_SIZE", "Timer", "FpsMeter"]
