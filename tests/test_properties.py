"""Property-based invariants over randomized change streams (hypothesis).

Mirrors the depth the reference gets from dbt's schema tests — but
generative: SCD2 and sessionization invariants must hold for *any*
event stream, not just the fixtures.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

EVENT = st.tuples(
    st.integers(min_value=1, max_value=4),          # user_id
    st.integers(min_value=0, max_value=100_000),    # seconds offset
    st.sampled_from(["a", "b", "c"]),               # attr
    st.integers(min_value=0, max_value=3),          # value (small domain → hash collisions)
)
STREAMS = st.lists(EVENT, min_size=1, max_size=40)

BASE = datetime(2024, 1, 1)


def _df(spark, events):
    rows = [
        (i, u, BASE + timedelta(seconds=s), a, float(v))
        for i, (u, s, a, v) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def _build(spark, events):
    from northwind_warehouse_spark.functions.hashing import num_str, surrogate_key
    from northwind_warehouse_spark.operators.scd2 import scd2_from_change_stream

    return scd2_from_change_stream(
        _df(spark, events),
        key_cols=["user_id"], ts_col="ts",
        hash_col=surrogate_key("event_type", num_str("value")),
        attr_cols=["event_type", "value"], tiebreak_cols=["event_id"], sk_name="sk",
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(STREAMS)
def test_scd2_invariants_hold_for_any_stream(spark, events):
    rows = _build(spark, events).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r)
    for versions in by_key.values():
        versions.sort(key=lambda r: r.version_no)
        # dense versions, exactly one active, sentinel boundaries
        assert [v.version_no for v in versions] == list(range(1, len(versions) + 1))
        assert sum(v.is_active == "Y" for v in versions) == 1
        assert versions[0].effective_date.year == 1900
        assert versions[-1].expiry_date.year == 2200
        # no adjacent duplicate hashes, contiguous intervals
        for a, b in zip(versions, versions[1:]):
            assert a.row_hash != b.row_hash
            assert a.expiry_date == b.updated_at


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(STREAMS, STREAMS)
def test_scd2_merge_equals_rebuild_for_any_split(spark, first, second):
    from northwind_warehouse_spark.functions.hashing import num_str, surrogate_key
    from northwind_warehouse_spark.operators.scd2 import scd2_merge

    # renumber ids so the two halves never collide and 'second' is later
    off = max((s for (_, s, _, _) in first), default=0) + 1
    second = [(u, off + s, a, v) for (u, s, a, v) in second]
    all_events = first + second

    kwargs = dict(
        key_cols=["user_id"], ts_col="ts",
        hash_col=surrogate_key("event_type", num_str("value")),
        attr_cols=["event_type", "value"], tiebreak_cols=["event_id"], sk_name="sk",
    )
    full = _build(spark, all_events)

    from northwind_warehouse_spark.operators.scd2 import scd2_from_change_stream

    base = scd2_from_change_stream(_df(spark, first), **kwargs)
    # event ids must stay globally unique across the split
    n1 = len(first)
    rows2 = [
        (n1 + i, u, BASE + timedelta(seconds=s), a, float(v))
        for i, (u, s, a, v) in enumerate(second)
    ]
    changes = spark.createDataFrame(
        rows2, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    merged = scd2_merge(base, changes, **kwargs)

    def key(df):
        return sorted(
            (r.user_id, r.version_no, str(r.effective_date), str(r.expiry_date), r.is_active, r.row_hash)
            for r in df.collect()
        )

    assert key(merged) == key(full)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(STREAMS)
def test_sessionize_partitions_events_exactly(spark, events):
    from northwind_warehouse_spark.operators.sessionize import sessionize

    df = _df(spark, events)
    out = sessionize(df, "user_id", "ts", gap_seconds=600, tiebreak_cols=("event_id",))
    # bijection: every event appears exactly once with a session id
    assert out.count() == df.count()
    rows = sorted(out.collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    last: dict[int, object] = {}
    sess: dict[int, int] = {}
    for r in rows:
        if r.user_id in last:
            gap = (r.ts - last[r.user_id]).total_seconds()
            expect = sess[r.user_id] + 1 if gap > 600 else sess[r.user_id]
        else:
            expect = 1
        assert r.session_idx == expect, (r, expect)
        last[r.user_id] = r.ts
        sess[r.user_id] = expect


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edge_list):
    from northwind_warehouse_spark.operators.components import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edge_list:
        union(a, b)
    want = {n: find(n) for n in parent}  # canonical min root per node

    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert got == want


@given(
    st.lists(
        # vocab {a,b} keeps distinct post-merge pair types ≤ 9, so the
        # query's top-10 shows ALL pairs and absence proves count == 0
        st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=8),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None)
def test_bpe_merge_never_leaves_adjacent_top_pair(spark, docs):
    """After applying the top merge greedily left-to-right, NO document
    contains the merged pair adjacently — the defining BPE invariant,
    for arbitrary corpora including self-pair runs."""
    from northwind_warehouse_spark.plans.llm import bpe_merge_step

    rows = [
        (i, " ".join(toks), "en", "src0", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    # need at least one adjacent pair somewhere, else there is no top pair
    if not any(len(t) >= 2 for t in docs):
        return
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as sf:
        df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
        out = bpe_merge_step(spark, sf).collect()
        if not out:
            return
        a, b = out[0].merged_a, out[0].merged_b
        # post-merge pair counts must not contain the merged raw pair
        assert not any(r.pair_a == a and r.pair_b == b for r in out)


@given(docs=st.lists(st.lists(st.sampled_from(["x", "y", "z"]), min_size=3, max_size=12), min_size=1, max_size=6))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_encode_compresses_monotonically(spark, docs):
    """bpe_encode never grows a document, and every saved token is
    accounted for: 0 ≤ n_saved < n_tokens_before, after == before −
    saved — for arbitrary small-alphabet corpora (the worst case for
    overlapping self-pairs)."""
    import os
    import tempfile

    from northwind_warehouse_spark.plans.llm import bpe_encode

    rows = [
        (i, " ".join(toks), "en", "src0", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as sf:
        df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
        for r in bpe_encode(spark, sf).collect():
            assert 0 <= r.n_saved < r.n_tokens_before
            assert r.n_tokens_after == r.n_tokens_before - r.n_saved
            assert r.n_tokens_after >= 1


def test_interpolation_stays_within_neighbor_bounds(spark):
    """Every interpolated hour lies between its neighboring observed
    values (inclusive) — the lerp can't overshoot; observed hours pass
    through unchanged."""
    from northwind_warehouse_spark.plans.analytics import events_interpolate
    from tests.conftest import SF_SMOKE

    rows = events_interpolate(spark, SF_SMOKE).collect()
    observed = [(i, r.cents_filled) for i, r in enumerate(rows) if not r.was_interpolated]
    obs_idx = [i for i, _ in observed]
    import bisect

    for i, r in enumerate(rows):
        if not r.was_interpolated:
            continue
        j = bisect.bisect_left(obs_idx, i)
        lo = observed[j - 1][1] if j > 0 else None
        hi = observed[j][1] if j < len(observed) else None
        bounds = [v for v in (lo, hi) if v is not None]
        assert bounds and min(bounds) <= r.cents_filled <= max(bounds)
