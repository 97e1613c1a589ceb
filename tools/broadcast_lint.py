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
assigned from ``load(spark, sf_dir, "<growing table>")``, from a known
SF-growing plan builder or corpus-grain operator (``lsh_candidate_pairs``
and friends), or from a method chain / helper call rooted at a growing
variable, and no BOUNDING operation appears in the chain. ``limit``
always bounds; a global ``agg`` bounds; ``groupBy(<growing-grain
key>).agg`` does NOT — an aggregate whose grain is a corpus-scale key
(cell_id, doc_id, vec_id, ...) has as many rows as distinct keys, which
grows with the warehouse (the round-6 blind spot: ``F.broadcast(n_vec)``
on a per-cell count table whose cell count is pinned to n/128).
Growth also propagates through plain helper calls (``_cap(assigned)``)
via their arguments. Per-bounded-domain aggregates that the key list
can't prove bounded are reviewed case-by-case and must still use
maybe_broadcast — the lint is a tripwire, not a proof system.
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
# (`agg` is handled separately: it bounds only when its groupBy grain is
# not a growing key — see GROWING_KEYS)
BOUNDING = {"limit"}
# plan builders whose output grows with SF (derived dims/staging views)
# plus corpus-grain operators: their output is corpus-row- or
# candidate-pair-sized, so anything derived from them (dup-id sets,
# membership flags, per-cell stats) grows with the warehouse
GROWING_FUNCS = {
    "dim_customer", "dim_part", "dim_supplier", "dim_part_multisource",
    "stg_customer", "stg_orders", "stg_lineitem", "stg_events",
    "scd2_users", "snapshot_users",
    # operators.similarity — corpus-grain / pair-grain outputs
    "shingle_arrays", "shingles", "minhash_signatures", "band_rows",
    "lsh_candidate_pairs", "pair_jaccard", "cap_buckets",
    "simhash_fp", "simhash32", "lsh_buckets",
    "ivf_assign", "ivf_assign_two_level", "ivf_probe_cells",
    "ivf_probe_cells_two_level", "pq_encode",
    # trained codebook: k rows, but k is occupancy-scalable (∝ n/128)
    "ivf_train_codebook", "_trained_cb",
}
# helpers whose OUTPUT is bounded by construction regardless of input
# size (fixed-shape codebooks/LUTs) — growth does not propagate through
BOUNDED_FUNCS = {"pq_codebook"}
# groupBy grains that scale with the warehouse: an agg over one of these
# keys has ~as many rows as the corpus has distinct entities, so it does
# NOT bound cardinality for broadcast purposes
GROWING_KEYS = {
    "cell_id", "doc_id", "doc_a", "doc_b", "vec_id", "chunk_id",
    "query_id", "neighbor_id", "fingerprint", "fp", "user_id",
    "o_orderkey", "o_custkey", "l_orderkey", "l_partkey", "l_suppkey",
    "c_custkey", "p_partkey", "s_suppkey", "bucket_id", "band_id",
    "customer_id", "order_id", "event_id",
}
# codebook-grain keys (centroid id / element index): an agg over these
# has k·dim rows — bounded while the centroid count is a module
# CONSTANT, but GROWING inside any function that derives its centroid
# count from the corpus row count (``table_rows`` ⇒ the occupancy-scaled
# policy, k ∝ n/128). The round-7 blind spot: a hard hint on such an
# agg goes unflagged until the constant is switched to the scaled
# policy — so in table_rows-calling functions these keys join
# GROWING_KEYS, and the escape hatch is the parameter-derived gate
# (``F.broadcast(x) if <param bytes> <= MAX_BROADCAST_BYTES else x``),
# which the linter recognizes and exempts.
OCCUPANCY_KEYS = {"j", "i"}


def _call_root(node: ast.expr) -> tuple[str | None, list[str], list[ast.Call]]:
    """Walk a method chain like ``x.filter(...).select(...)`` back to its
    root Name; return (root_name, methods along the chain, call nodes)."""
    methods: list[str] = []
    calls: list[ast.Call] = []
    cur = node
    while True:
        if isinstance(cur, ast.Call):
            calls.append(cur)
            cur = cur.func
        elif isinstance(cur, ast.Attribute):
            methods.append(cur.attr)
            cur = cur.value
        elif isinstance(cur, ast.Name):
            return cur.id, methods, calls
        else:
            return None, methods, calls


def _str_constants(call: ast.Call) -> set[str]:
    """String literals among a call's OWN arguments (not the chain
    below its ``func`` — a ``.filter(...)`` upstream of a ``.groupBy``
    must not leak its column names into the groupBy's key set)."""
    out: set[str] = set()
    for arg in list(call.args) + [kw.value for kw in call.keywords]:
        for n in ast.walk(arg):
            if isinstance(n, ast.Constant) and isinstance(n.value, str):
                out.add(n.value)
    return out


def _chain_bounds(
    methods: list[str], calls: list[ast.Call], growing_keys: set[str] = GROWING_KEYS
) -> bool:
    """True when the method chain bounds output cardinality: a ``limit``,
    or an ``agg`` whose grain is NOT a growing key. ``groupBy(<growing
    key>).agg`` keeps the growing classification — its row count tracks
    the corpus's distinct-key count."""
    if set(methods) & BOUNDING:
        return True
    if "agg" not in methods:
        return False
    for call in calls:
        if (
            isinstance(call.func, ast.Attribute)
            and call.func.attr in ("groupBy", "groupby")
            and (_str_constants(call) & growing_keys)
        ):
            return False
    return True


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


def _classify(
    node: ast.expr, env: dict[str, bool], growing_keys: set[str] = GROWING_KEYS
) -> bool:
    """True = growing."""
    if _is_growing_load(node):
        return True
    if isinstance(node, ast.Call):
        fname = None
        if isinstance(node.func, ast.Name):
            fname = node.func.id
        elif isinstance(node.func, ast.Attribute):
            fname = node.func.attr
        if fname in BOUNDED_FUNCS:
            return False
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
        root, methods, calls = _call_root(node)
        if root_growing is None:
            root_growing = env.get(root, False) if root else False
        if root_growing and not _chain_bounds(methods, calls, growing_keys):
            return True
        # plain helper calls (`_cap(assigned)`, `helper(df, spark)`)
        # preserve grain unless the chain above bounds it: propagate
        # growth through the call's dataframe arguments
        if (
            isinstance(node, ast.Call)
            and not _chain_bounds(methods, calls, growing_keys)
            and any(
                isinstance(a, ast.Name) and env.get(a.id, False) for a in node.args
            )
        ):
            return True
    return False


class _FnLinter(ast.NodeVisitor):
    def __init__(self, path: Path):
        self.path = path
        self.violations: list[tuple[str, int, str]] = []

    def visit_FunctionDef(self, fn: ast.FunctionDef) -> None:
        # a function that reads the corpus row count derives
        # occupancy-SCALED parameters: codebook-grain aggs (j/i) stop
        # counting as bounded there (round-7 verdict #5)
        calls_table_rows = any(
            isinstance(n, ast.Call)
            and (
                (isinstance(n.func, ast.Name) and n.func.id == "table_rows")
                or (isinstance(n.func, ast.Attribute) and n.func.attr == "table_rows")
            )
            for n in ast.walk(fn)
        )
        keys = GROWING_KEYS | OCCUPANCY_KEYS if calls_table_rows else GROWING_KEYS
        # hard hints guarded by a parameter-derived size gate
        # (`F.broadcast(x) if <bytes> <= MAX_BROADCAST_BYTES else x`, or
        # the if-statement form) are the SANCTIONED escape hatch — the
        # hint self-disables when the parameter outgrows the ceiling.
        # Only the F.broadcast call that IS the gated expression is
        # exempt (the IfExp body, or the value of an assignment directly
        # inside the If body) — exempting every descendant of the
        # conditional would silently pass unrelated hard hints parked in
        # either branch (round-8 advice).
        gated: set[int] = set()

        def _is_bcast_call(x: ast.expr) -> bool:
            return (
                isinstance(x, ast.Call)
                and isinstance(x.func, ast.Attribute)
                and x.func.attr == "broadcast"
                and isinstance(x.func.value, ast.Name)
                and x.func.value.id == "F"
            )

        for n in ast.walk(fn):
            if not isinstance(n, (ast.IfExp, ast.If)) or not any(
                isinstance(t, ast.Name) and t.id == "MAX_BROADCAST_BYTES"
                for t in ast.walk(n.test)
            ):
                continue
            if isinstance(n, ast.IfExp):
                for branch in (n.body, n.orelse):
                    if _is_bcast_call(branch):
                        gated.add(id(branch))
            else:
                for stmt in n.body + n.orelse:
                    if isinstance(stmt, ast.Assign) and _is_bcast_call(stmt.value):
                        gated.add(id(stmt.value))
        # FLAT ivf_assign is n·k dot products — fine while k is a module
        # CONSTANT, quadratic the moment the same function derives its
        # centroid count from the corpus row count (the occupancy
        # policy, k ∝ n/128). ivf_assign_two_level exists for exactly
        # that regime (n·2√k), so a flat assign inside a
        # table_rows-calling function is a red regardless of broadcast
        # hints (round-8 verdict #5: nothing guarded the combination).
        if calls_table_rows:
            for node in ast.walk(fn):
                if (
                    isinstance(node, ast.Call)
                    and (
                        (isinstance(node.func, ast.Name) and node.func.id == "ivf_assign")
                        or (
                            isinstance(node.func, ast.Attribute)
                            and node.func.attr == "ivf_assign"
                        )
                    )
                ):
                    self.violations.append(
                        (fn.name, node.lineno,
                         "flat ivf_assign under a table_rows-derived centroid "
                         "count — use ivf_assign_two_level")
                    )
        env: dict[str, bool] = {}
        for node in ast.walk(fn):
            if isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(
                node.targets[0], ast.Name
            ):
                env[node.targets[0].id] = _classify(node.value, env, keys)
        for node in ast.walk(fn):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
                and node.args
                and id(node) not in gated
                and _classify(node.args[0], env, keys)
            ):
                src = ast.unparse(node.args[0])[:60]
                self.violations.append((fn.name, node.lineno, f"F.broadcast({src})"))
        # don't recurse into nested defs twice
        self.generic_visit(fn)


def find_violations(paths: list[Path] | None = None) -> list[str]:
    out: list[str] = []
    for path in paths if paths is not None else LINT_FILES:
        tree = ast.parse(path.read_text())
        linter = _FnLinter(path)
        linter.visit(tree)
        for fn, line, msg in linter.violations:
            rel = path.relative_to(REPO) if path.is_relative_to(REPO) else path
            out.append(f"{rel}:{line} in {fn}(): {msg}")
    return out


if __name__ == "__main__":
    v = find_violations()
    for line in v:
        print(line)
    sys.exit(1 if v else 0)
