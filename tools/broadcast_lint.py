#!/usr/bin/env python3
"""Static lint: no hard ``F.broadcast`` hint may target an SF-growing
base table (or a projection/filter of one).

A hard hint overrides AQE's size check, so hinting a table whose
cardinality grows with the warehouse (customer, part, supplier, orders,
lineitem, events, documents, embeddings) is a latent 100-TB OOM — those
sides must go through ``operators.joins.maybe_broadcast`` instead.
Bounded relations (nation, region, date spines, aggregates, codebooks)
may keep the plain hint.

Heuristic dataflow, per function: a variable is GROWING when it is
assigned from ``load(spark, sf_dir, "<growing table>")`` (or a method
chain rooted at a growing variable) and no BOUNDING operation appears in
the chain. ``agg``/``limit`` bound cardinality (every ``groupBy`` here
is followed by ``agg``; per-entity aggregates that legitimately grow are
reviewed case-by-case and must still use maybe_broadcast — the lint is a
tripwire for the raw-table class, not a proof system).
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "northwind_warehouse_spark"
LINT_FILES = sorted((PKG / "plans").glob("*.py")) + [PKG / "streaming" / "jobs.py"]

GROWING_TABLES = {
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
}
# chain methods that bound output cardinality regardless of input size
BOUNDING = {"agg", "limit"}
# plan builders whose output grows with SF (derived dims/staging views)
GROWING_FUNCS = {
    "dim_customer", "dim_part", "dim_supplier", "dim_part_multisource",
    "stg_customer", "stg_orders", "stg_lineitem", "stg_events",
    "scd2_users", "snapshot_users",
}


def _call_root(node: ast.expr) -> tuple[str | None, list[str]]:
    """Walk a method chain like ``x.filter(...).select(...)`` back to its
    root Name; return (root_name, methods along the chain)."""
    methods: list[str] = []
    cur = node
    while True:
        if isinstance(cur, ast.Call):
            cur = cur.func
        elif isinstance(cur, ast.Attribute):
            methods.append(cur.attr)
            cur = cur.value
        elif isinstance(cur, ast.Name):
            return cur.id, methods
        else:
            return None, methods


def _is_growing_load(node: ast.expr) -> bool:
    """True for load(spark, sf_dir, "<growing>"), catalog.load(...), or
    a call to a known SF-growing plan builder (dim_customer etc.)."""
    if not isinstance(node, ast.Call):
        return False
    fname = None
    if isinstance(node.func, ast.Name):
        fname = node.func.id
    elif isinstance(node.func, ast.Attribute):
        fname = node.func.attr
    if fname in GROWING_FUNCS:
        return True
    if fname != "load":
        return False
    for arg in node.args:
        if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
            if arg.value in GROWING_TABLES:
                return True
    return False


def _classify(node: ast.expr, env: dict[str, bool]) -> bool:
    """True = growing."""
    if _is_growing_load(node):
        return True
    if isinstance(node, ast.Name):
        return env.get(node.id, False)
    if isinstance(node, (ast.Call, ast.Attribute)):
        # a load(...) buried at the chain root
        cur = node
        while isinstance(cur, (ast.Call, ast.Attribute)):
            inner = cur.func if isinstance(cur, ast.Call) else cur.value
            if _is_growing_load(inner):
                root_growing = True
                break
            cur = inner
        else:
            root_growing = None
        root, methods = _call_root(node)
        if root_growing is None:
            root_growing = env.get(root, False) if root else False
        if root_growing and not (set(methods) & BOUNDING):
            return True
    return False


class _FnLinter(ast.NodeVisitor):
    def __init__(self, path: Path):
        self.path = path
        self.violations: list[tuple[str, int, str]] = []

    def visit_FunctionDef(self, fn: ast.FunctionDef) -> None:
        env: dict[str, bool] = {}
        for node in ast.walk(fn):
            if isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(
                node.targets[0], ast.Name
            ):
                env[node.targets[0].id] = _classify(node.value, env)
        for node in ast.walk(fn):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
                and node.args
                and _classify(node.args[0], env)
            ):
                src = ast.unparse(node.args[0])[:60]
                self.violations.append((fn.name, node.lineno, src))
        # don't recurse into nested defs twice
        self.generic_visit(fn)


def find_violations() -> list[str]:
    out: list[str] = []
    for path in LINT_FILES:
        tree = ast.parse(path.read_text())
        linter = _FnLinter(path)
        linter.visit(tree)
        for fn, line, src in linter.violations:
            out.append(f"{path.relative_to(REPO)}:{line} in {fn}(): F.broadcast({src})")
    return out


if __name__ == "__main__":
    v = find_violations()
    for line in v:
        print(line)
    sys.exit(1 if v else 0)
