from .interval import (
    interval_filter,
    interval_join,
    overlaps,
)

__all__ = ["interval_filter", "interval_join", "overlaps"]
