"""Source-lint for the repeated scale defect class: an explicit
``broadcast(x)`` hint where ``x`` derives from a load of an SF-scaling
table.  An explicit hint OVERRIDES autoBroadcastJoinThreshold, so such a
plan works at every local SF and OOMs the driver only at cluster scale —
the exact defect ADVICE r10 found on q58's customer, VERDICT r11 found
on q58/q59's supplier, and VERDICT r12 found on q57's part slice (a
FILTERED load the r12 lint waved through).  This lint makes the fourth
occurrence a test failure instead of a judge finding.

r13 tightening (VERDICT r12 task #3 + ADVICE r12):

* A ``.filter()``/``.where()`` no longer clears a scaling-table load —
  q57's three-brand × size≤15 slice was 2.4% of part, ~4.8M rows at
  SF1000, and sailed through the r12 lint.  A fraction of a scaling
  dimension still scales.  The ONLY source-level pattern accepted as
  absolutely bounded is ``.limit(n)``; anything else needs an ``ALLOW``
  entry whose justification states an absolute byte bound.
* Clearing is ORDER-AWARE: a bounded (re)binding counts only if it
  precedes the broadcast call (by line number) — previously
  ``join(F.broadcast(s)); s = s.filter(...)`` escaped because the
  clearing check ignored statement order.

Bounded driver artifacts (1-row stats, capped probe sets built by
``.limit``/aggregation of non-load frames) never match the pattern."""

from __future__ import annotations

import ast
import re
from pathlib import Path

QUERIES_DIR = Path(__file__).resolve().parent.parent / "disq_original_spark" / "queries"

# Tables whose row count scales with SF.  nation/region are constant
# (25 / 5 rows) and always broadcastable.
SCALING = (
    "customer", "supplier", "orders", "lineitem", "part",
    "documents", "embeddings", "events",
)

# "file.py:function:name" -> justification, for deliberately allowed
# sites.  A justification MUST state an ABSOLUTE size bound (rows/bytes
# at SF1000), never a fraction of the dimension — fractions of a scaling
# table scale (the q57 lesson).
ALLOW: dict[str, str] = {}

_LOAD = re.compile(r"(_t\(|load_table\(|load_wide\()")


def _is_scaling_load(expr_src: str) -> bool:
    """The expression loads an SF-scaling table (filtered or not)."""
    return bool(
        _LOAD.search(expr_src)
        and any(f"'{t}'" in expr_src or f'"{t}"' in expr_src for t in SCALING)
    )


def _is_bounded(expr_src: str) -> bool:
    """The only source pattern accepted as absolutely bounded: the
    OUTERMOST call of the expression chain is ``.limit(n)`` — i.e. the
    frame actually being bound is the one that was limited.  A
    ``.limit(`` merely APPEARING somewhere in the string (e.g. bounding
    a probe set joined INTO an unbounded load:
    ``_t(...,'part').join(probe.limit(5), k)``) does not clear
    (code-review r13 finding #2); a post-limit transform like
    ``.limit(100).select(...)`` conservatively stays flagged — route
    real cases through ALLOW."""
    try:
        node = ast.parse(expr_src, mode="eval").body
    except SyntaxError:
        return False
    return (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr == "limit"
    )


def _broadcast_calls(fn: ast.AST):
    """Yield every F.broadcast(...) / broadcast(...) call in the
    function."""
    for node in ast.walk(fn):
        if not (isinstance(node, ast.Call) and node.args):
            continue
        is_attr = isinstance(node.func, ast.Attribute) and node.func.attr == "broadcast"
        is_bare = isinstance(node.func, ast.Name) and node.func.id == "broadcast"
        if is_attr or is_bare:
            yield node


def _flag_sites(tree: ast.AST, fname: str) -> list[str]:
    """Per-FUNCTION scoping: a broadcast(NAME) is checked only against
    NAME's assignments inside the same function body, in statement
    order."""
    bad: list[str] = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        assigns: dict[str, list[tuple[int, str]]] = {}

        def record(target: ast.expr, value: ast.expr, lineno: int) -> None:
            if isinstance(target, ast.Name):
                assigns.setdefault(target.id, []).append(
                    (lineno, ast.unparse(value))
                )
            elif isinstance(target, (ast.Tuple, ast.List)) and isinstance(
                value, (ast.Tuple, ast.List)
            ) and len(target.elts) == len(value.elts):
                # a, b = _t(...), _t(...) — pair names elementwise
                for t, v in zip(target.elts, value.elts):
                    record(t, v, lineno)

        for node in ast.walk(fn):
            if isinstance(node, ast.Assign):
                for tgt in node.targets:
                    record(tgt, node.value, node.lineno)
            elif isinstance(node, ast.AnnAssign) and node.value is not None:
                # s: DataFrame = _t(...) — annotated single assignment
                record(node.target, node.value, node.lineno)
            elif isinstance(node, ast.NamedExpr):
                # (s := _t(...)) — walrus binding
                record(node.target, node.value, node.lineno)
        for call in _broadcast_calls(fn):
            arg = call.args[0]
            if isinstance(arg, ast.Name):
                name = arg.id
                if f"{fname}:{fn.name}:{name}" in ALLOW:
                    continue
                stmts = assigns.get(name, [])
                # flag when any assignment of the name (anywhere in the
                # function — a later rebinding proves nothing about the
                # frame being broadcast) is a scaling-table load, unless
                # the LATEST (re)binding preceding the broadcast call is
                # bounded — "any bounded binding before the call" would
                # let `s = load.limit(100); s = load; broadcast(s)`
                # escape (code-review r13 finding #1)
                flagged = [
                    s for ln, s in stmts
                    if _is_scaling_load(s) and not _is_bounded(s)
                ]
                preceding = [(ln, s) for ln, s in stmts if ln < call.lineno]
                cleared = bool(preceding) and _is_bounded(
                    max(preceding, key=lambda t: t[0])[1]
                )
                if flagged and not cleared:
                    bad.append(
                        f"{fname}:{call.lineno} broadcast({name}) in {fn.name}() — "
                        f"scaling-table load without absolute bound: {flagged[0][:90]}"
                    )
            else:
                # inline form: broadcast(_t(spark, sf, "supplier")...)
                expr = ast.unparse(arg)
                if f"{fname}:{fn.name}:<inline>" in ALLOW:
                    continue
                if _is_scaling_load(expr) and not _is_bounded(expr):
                    bad.append(
                        f"{fname}:{call.lineno} broadcast(<inline>) in {fn.name}() — "
                        f"scaling-table load without absolute bound: {expr[:90]}"
                    )
    return bad


def test_no_broadcast_hint_on_scaling_table():
    bad: list[str] = []
    for f in sorted(QUERIES_DIR.glob("*.py")):
        bad += _flag_sites(ast.parse(f.read_text()), f.name)
    assert not bad, (
        "broadcast hint on an SF-scaling table (overrides "
        "autoBroadcastJoinThreshold; OOMs the driver at cluster scale — "
        "drop the hint and let AQE choose, bound the frame with .limit(), "
        "or add the site to ALLOW with an ABSOLUTE size justification):\n"
        + "\n".join(bad)
    )


def test_lint_catches_the_defect_class():
    """Self-test: every spelling of the r10/r11/r12 defect is flagged,
    and the legitimate patterns are not."""
    flagged = lambda src: _flag_sites(ast.parse(src), "fake.py")  # noqa: E731
    # bare-name assignment
    assert flagged(
        "def q(spark, sf):\n"
        "    s = _t(spark, sf, 'supplier')\n"
        "    return li.join(F.broadcast(s), on)\n"
    )
    # inline call
    assert flagged(
        "def q(spark, sf):\n"
        "    return li.join(F.broadcast(_t(spark, sf, 'supplier')), on)\n"
    )
    # bare `broadcast` import spelling
    assert flagged(
        "def q(spark, sf):\n"
        "    c = load_table(spark, sf, 'customer')\n"
        "    return li.join(broadcast(c), on)\n"
    )
    # r12 blind spot closed: a FILTERED slice of a scaling table is a
    # fraction of something that scales — still flagged (the q57 defect)
    assert flagged(
        "def q(spark, sf):\n"
        "    p = _t(spark, sf, 'part').filter(F.col('p_size') <= 49)\n"
        "    return li.join(F.broadcast(p), on)\n"
    )
    assert flagged(
        "def q(spark, sf):\n"
        "    p = _t(spark, sf, 'part').filter(F.col('p_type') == 'X')\n"
        "    return li.join(F.broadcast(p), on)\n"
    )
    # ADVICE r12 ordering hole closed: a bounded rebinding AFTER the
    # broadcast call does not clear it
    assert flagged(
        "def q(spark, sf):\n"
        "    s = _t(spark, sf, 'supplier')\n"
        "    out = li.join(F.broadcast(s), on)\n"
        "    s = s.limit(10)\n"
        "    return out\n"
    )
    # code-review r13 #1: a bounded binding followed by an UNBOUNDED
    # rebinding must not clear — the broadcast sees the full load
    assert flagged(
        "def q(spark, sf):\n"
        "    s = _t(spark, sf, 'supplier').limit(100)\n"
        "    s = _t(spark, sf, 'supplier')\n"
        "    return li.join(F.broadcast(s), on)\n"
    )
    # code-review r13 #2: a .limit() on a JOINED probe set does not
    # bound the scaling load being broadcast — named and inline forms
    assert flagged(
        "def q(spark, sf):\n"
        "    p = _t(spark, sf, 'part').join(probe.limit(5), k)\n"
        "    return li.join(F.broadcast(p), on)\n"
    )
    assert flagged(
        "def q(spark, sf):\n"
        "    return li.join(F.broadcast(_t(spark, sf, 'part').join(probe.limit(5), k)), on)\n"
    )
    # assignment-form evasions (r13 hardening): annotated and
    # tuple-unpacking assignments are tracked like plain ones
    assert flagged(
        "def q(spark, sf):\n"
        "    s: DataFrame = _t(spark, sf, 'supplier')\n"
        "    return li.join(F.broadcast(s), on)\n"
    )
    assert flagged(
        "def q(spark, sf):\n"
        "    s, c = _t(spark, sf, 'supplier'), _t(spark, sf, 'customer')\n"
        "    return li.join(F.broadcast(s), on)\n"
    )
    assert flagged(
        "def q(spark, sf):\n"
        "    if (s := _t(spark, sf, 'supplier')).count() > 0:\n"
        "        return li.join(F.broadcast(s), on)\n"
    )
    # explicit absolute bound BEFORE the broadcast: allowed
    assert not flagged(
        "def q(spark, sf):\n"
        "    s = _t(spark, sf, 'supplier').limit(100)\n"
        "    return li.join(F.broadcast(s), on)\n"
    )
    assert not flagged(
        "def q(spark, sf):\n"
        "    s = _t(spark, sf, 'supplier')\n"
        "    s = s.filter(F.col('s_acctbal') > 0).limit(100)\n"
        "    return li.join(F.broadcast(s), on)\n"
    )
    # constant dims: allowed
    assert not flagged(
        "def q(spark, sf):\n"
        "    n = _t(spark, sf, 'nation')\n"
        "    return li.join(F.broadcast(n), on)\n"
    )
    # derived bounded artifacts (aggregates of non-load frames): allowed
    assert not flagged(
        "def q(spark, sf):\n"
        "    stats = li.agg(F.max('x').alias('m'))\n"
        "    return li.crossJoin(F.broadcast(stats))\n"
    )
