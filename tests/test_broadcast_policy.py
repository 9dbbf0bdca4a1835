"""Source-lint for the repeated scale defect class: an explicit
``F.broadcast(x)`` where ``x`` is an UNFILTERED load of an SF-scaling
table.  An explicit hint OVERRIDES autoBroadcastJoinThreshold, so such a
plan works at every local SF and OOMs the driver only at cluster scale —
the exact defect ADVICE r10 found on q58's customer and VERDICT r11
found on q58/q59's supplier.  This lint makes the third occurrence a
test failure instead of a judge finding.

Scope is deliberately narrow (zero false positives beats exhaustive):
only a broadcast of a NAME whose assignment in the same file loads a
scaling table via _t()/load_table()/load_wide() without any .filter(...)
on the load expression.  Filtered slices (part p_type slices, nation
name slices) remain allowed — their hints carry justification comments
at the call sites; bounded driver artifacts (1-row stats, capped probe
sets) never match the pattern at all."""

from __future__ import annotations

import re
from pathlib import Path

QUERIES_DIR = Path(__file__).resolve().parent.parent / "disq_original_spark" / "queries"

# Tables whose row count scales with SF.  nation/region are constant
# (25 / 5 rows) and always broadcastable.
SCALING = (
    "customer", "supplier", "orders", "lineitem", "part",
    "documents", "embeddings", "events",
)

# "file.py:function:name" -> reason, for deliberately allowed sites (none today)
ALLOW: dict[str, str] = {}


import ast


def _flag_sites(tree: ast.AST, fname: str) -> list[str]:
    """Per-FUNCTION scoping: a broadcast(NAME) is checked only against
    NAME's assignments inside the same function body."""
    bad: list[str] = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        assigns: dict[str, list[str]] = {}
        for node in ast.walk(fn):
            if isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(node.targets[0], ast.Name):
                assigns.setdefault(node.targets[0].id, []).append(ast.unparse(node.value))
        for node in ast.walk(fn):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
                and node.args
                and isinstance(node.args[0], ast.Name)
            ):
                name = node.args[0].id
                if f"{fname}:{fn.name}:{name}" in ALLOW:
                    continue
                for stmt in assigns.get(name, []):
                    loads = re.search(r"(_t\(|load_table\(|load_wide\()", stmt)
                    table = any(f"'{t}'" in stmt or f'"{t}"' in stmt for t in SCALING)
                    if loads and table and ".filter(" not in stmt and ".where(" not in stmt:
                        bad.append(
                            f"{fname}:{node.lineno} F.broadcast({name}) in {fn.name}() — "
                            f"unfiltered scaling-table load: {stmt[:90]}"
                        )
    return bad


def test_no_broadcast_hint_on_unfiltered_scaling_table():
    bad: list[str] = []
    for f in sorted(QUERIES_DIR.glob("*.py")):
        bad += _flag_sites(ast.parse(f.read_text()), f.name)
    assert not bad, (
        "broadcast hint on an unfiltered SF-scaling table (overrides "
        "autoBroadcastJoinThreshold; OOMs the driver at cluster scale — "
        "drop the hint and let AQE choose, or add the site to ALLOW with "
        "a cardinality-bound justification):\n" + "\n".join(bad)
    )
