from . import _mask
from .refer import REFER

__all__ = ["_mask", "REFER"]
