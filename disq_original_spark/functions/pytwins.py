"""Python twins of the engine's text-normalization expressions.

These encode the EXACT cross-engine semantics (JVM regex / DuckDB RE2) that
the fused Arrow passes in queries/dedup.py and queries/textops.py rely on
for oracle parity.  Two traps this module pins down (see
``tests/test_props.py::test_text_normalization_cross_engine_adversarial``):

* Whitespace is the EXPLICIT class ``[ \\t\\n\\x0b\\f\\r]+`` everywhere, not
  ``\\s`` — Java's ``\\s`` includes vertical tab (\\x0b) while RE2's
  excludes it, so ``\\s`` silently tokenizes differently across engines on
  real-world corpora.  Every oracle SQL string uses the same class.
* Trim is ASCII-space-only: both Spark's ``trim()`` and DuckDB's ``trim()``
  strip 0x20 from the ends and nothing else — Python's ``str.strip()``
  default (all Unicode whitespace) would diverge.

Single source of truth; do not re-declare the class/trim set at call sites.

NULL text: the DuckDB oracles drop null-text rows (``string_split_regex(NULL)``
→ NULL → ``unnest`` yields nothing), so callers skip a document when these
helpers return None.
"""

from __future__ import annotations

import re

WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")
TRIM_CHARS = " "


def norm_text(text: str | None) -> str | None:
    """lower + engine-trim (ASCII space only) + collapse whitespace-class
    runs to single spaces."""
    if text is None:
        return None
    return WS_RE.sub(" ", text.strip(TRIM_CHARS).lower())


def py_tokens(text: str | None) -> list[str] | None:
    """Twin of ``functions.tokens`` (split on the whitespace class after
    lower+trim) with the
    JVM's empty-string edge case preserved: splitting '' yields ['']."""
    if text is None:
        return None
    return WS_RE.split(text.strip(TRIM_CHARS).lower())


# translate table folding every whitespace-class char to ' ': lets the
# shingle twin use C-speed str.split(' ')+drop-empties, which is
# EXACTLY regex-split-on-runs with empties dropped (runs become multiple
# spaces -> multiple dropped empties) — ~2x faster in the fused Arrow
# passes, zero semantic change (pinned by the adversarial corpus test)
_WS_TO_SPACE = str.maketrans({c: " " for c in "\t\n\x0b\f\r"})


def py_shingles(text: str | None, k: int = 5) -> list[str] | None:
    """Word k-gram shingles; short docs collapse to one whole-doc shingle."""
    if text is None:
        return None
    toks = [
        t
        for t in text.strip(TRIM_CHARS).lower().translate(_WS_TO_SPACE).split(" ")
        if t
    ]
    if len(toks) >= k:
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return [" ".join(toks)]
