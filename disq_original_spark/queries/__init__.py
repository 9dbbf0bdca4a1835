"""Declared query surface: every operator this engine claims is registered
here with (a) a DataFrame builder and (b) a DuckDB oracle SQL string (when the
semantics are ANSI-SQL-expressible).  The driver's correctness harness and our
own pytest suite both consume this registry.
"""

from __future__ import annotations

from .registry import QUERIES, Query, query

# Import for registration side effects.
from . import relational  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import packing  # noqa: E402,F401
from . import genomic  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import streamq  # noqa: E402,F401

__all__ = ["QUERIES", "Query", "query"]
