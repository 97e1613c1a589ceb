"""operators.xplode — inner-explode row semantics without the
InferFiltersFromGenerate re-evaluation (round 13).

Two claims, both load-bearing:
1. select_explode returns EXACTLY the rows of a plain F.explode for
   arrays without null elements (the documented precondition), across
   the tricky cases: empty arrays, null arrays, multi-element arrays.
2. The physical plan carries NO Filter that inlines the computed
   array expression (the disease: a pushed-down size()>0/isnotnull
   filter re-evaluating the array — and any lambda inside it — per
   element; measured 10× on the shingle explode).
"""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from northwind_warehouse_spark.operators.xplode import select_explode


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "one two three"),
            (3, ""),            # splits to [""] — 1 element
            (4, None),          # null text → null array
        ],
        "id bigint, text string",
    )


def _computed_array(d):
    # an aliased, computed array with a staged lambda input — the shape
    # that triggers the inferred-filter inlining on plain F.explode
    return d.select(
        "id", F.split("text", " ").alias("w")
    ).select(
        "id",
        F.expr(
            "transform(sequence(0, size(w)-1), i -> concat(w[i], '!'))"
        ).alias("arr"),
    )


def test_rows_match_inner_explode(docs):
    base = _computed_array(docs)
    inner = base.select("id", F.explode("arr").alias("x"))
    fixed = select_explode(base, "arr", "x", "id")
    assert sorted(inner.collect()) == sorted(fixed.collect())


def test_empty_and_null_arrays_drop(docs, spark):
    d = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)],
        "id bigint, arr array<string>",
    )
    out = select_explode(d, "arr", "x", "id")
    assert sorted((r.id, r.x) for r in out.collect()) == [(1, "a"), (1, "b")]


def test_no_inlined_filter_in_plan(docs):
    base = _computed_array(docs)
    diseased = _plan(base.select(F.explode("arr").alias("x")))
    fixed = _plan(select_explode(base, "arr", "x"))

    def lambda_filters(plan: str) -> int:
        return sum(
            1
            for block in plan.split("\n\n")
            if block.startswith("(")
            and ") Filter" in block.split("\n")[0]
            and "lambdafunction" in block
        )

    # the seeded-disease control proves the detector sees the inlining
    assert lambda_filters(diseased) >= 1
    assert lambda_filters(fixed) == 0
