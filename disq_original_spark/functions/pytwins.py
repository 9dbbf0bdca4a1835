"""Python twins of the engine's text-normalization expressions.

These encode the EXACT cross-engine semantics (JVM regex / DuckDB) that the
fused Arrow passes in queries/dedup.py and queries/textops.py rely on for
oracle parity: ASCII ``\\s`` (``[ \\t\\n\\r\\f\\v]+``) and Java ``trim()``
behavior — Python's Unicode-aware ``str.split``/``str.strip`` defaults would
diverge on exotic whitespace.  Single source of truth; do not re-declare the
class/trim set at call sites.

NULL text: the DuckDB oracles drop null-text rows (``string_split_regex(NULL)``
→ NULL → ``unnest`` yields nothing), so callers skip a document when these
helpers return None.
"""

from __future__ import annotations

import re

WS_RE = re.compile(r"[ \t\n\r\f\v]+")
TRIM_CHARS = " \t\n\r\f\v"


def norm_text(text: str | None) -> str | None:
    """lower + Java-trim + collapse ASCII whitespace runs to single spaces."""
    if text is None:
        return None
    return WS_RE.sub(" ", text.strip(TRIM_CHARS).lower())


def py_tokens(text: str | None) -> list[str] | None:
    """Twin of ``functions.tokens`` (split on \\s+ after lower+trim) with the
    JVM's empty-string edge case preserved: splitting '' yields ['']."""
    if text is None:
        return None
    return WS_RE.split(text.strip(TRIM_CHARS).lower())


def py_shingles(text: str | None, k: int = 5) -> list[str] | None:
    """Word k-gram shingles; short docs collapse to one whole-doc shingle."""
    if text is None:
        return None
    toks = [t for t in WS_RE.split(text.strip(TRIM_CHARS).lower()) if t]
    if len(toks) >= k:
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return [" ".join(toks)]
