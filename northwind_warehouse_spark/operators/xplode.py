"""Explode of a COMPUTED array without the inferred-filter re-evaluation.

``F.explode(expensive_array_expr)`` triggers Catalyst's
``InferFiltersFromGenerate``: a ``size(e) > 0 AND isnotnull(e)`` filter is
added below the Generate so empty-array rows are skipped early. When ``e``
is an *aliased expression* (not a materialized attribute), predicate
pushdown then pushes that filter through the staging projection, INLINING
the whole array expression into both conjuncts — and any column the
expression staged for its lambda (e.g. ``split(text)`` behind a word
array) is re-inlined into the lambda BODY, re-evaluating once per array
ELEMENT per conjunct. This is the exact per-element blowup the repo's
lambda lint bans in source, but introduced by the OPTIMIZER: measured 10×
on the shingle explode (3.5s → 0.33s at sf0.1 — see shingle_df_profile).

``select_explode`` sidesteps the rule: ``explode_outer`` is not matched
by ``InferFiltersFromGenerate`` (skipping rows is impossible when empty
arrays must emit a null row), and a post-Generate ``isNotNull`` filter on
the OUTPUT attribute restores inner-explode row semantics.

Equivalence precondition (caller-checked, asserted nowhere): the array
expression never produces NULL **elements**. Inner ``explode`` keeps null
elements; outer + isNotNull drops them. Empty/null ARRAYS are fine — the
outer null-row is removed by the same filter. Every current caller feeds
arrays built by ``concat_ws``/``transform``/``sequence``/``split``, none
of which emit null elements.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def select_explode(df, col, alias: str, *keep: str):
    """``df.select(*keep, explode(col) AS alias)`` with inner-explode row
    semantics but no inferred-filter re-evaluation of ``col``.

    ``col`` must never contain NULL elements (see module docstring)."""
    out = df.select(*keep, F.explode_outer(col).alias(alias))
    return out.filter(F.col(alias).isNotNull())
