"""End-to-end incremental pipeline: incremental run ≡ one-shot rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

SPLIT_TS = "2024-01-15 00:00:00"


def _dim_rows(df):
    return sorted(
        (r.user_id, r.version_no, str(r.effective_date), str(r.expiry_date), r.is_active, r.row_hash)
        for r in df.collect()
    )


def test_incremental_scd2_equals_full_rebuild(spark, tmp_path):
    """Build the dim from the first half of events, merge the second half
    incrementally, and compare against a single full build."""
    from northwind_warehouse_spark.catalog import load
    from northwind_warehouse_spark.functions.hashing import num_str, surrogate_key
    from northwind_warehouse_spark.operators.scd2 import scd2_from_change_stream, scd2_merge

    e = load(spark, SF_SMOKE, "events").select("event_id", "user_id", "ts", "event_type", "value")
    first = e.filter(F.col("ts") <= SPLIT_TS)
    second = e.filter(F.col("ts") > SPLIT_TS)
    kwargs = dict(
        key_cols=["user_id"], ts_col="ts",
        hash_col=surrogate_key("event_type", num_str("value")),
        attr_cols=["event_type", "value"], tiebreak_cols=["event_id"], sk_name="user_sk",
    )
    full = scd2_from_change_stream(e, **kwargs)
    incremental = scd2_merge(scd2_from_change_stream(first, **kwargs), second, **kwargs)
    assert _dim_rows(incremental) == _dim_rows(full)


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    """Quality gate → dedup → chunk → split, partitioned by split."""
    import os

    from northwind_warehouse_spark.plans.llm import quality_filter
    from northwind_warehouse_spark.plans.pipeline import CorpusPipeline

    p = CorpusPipeline(spark, str(tmp_path / "corpus"))
    out = p.run(SF_SMOKE)

    n_kept_docs = quality_filter(spark, SF_SMOKE).count()
    assert out.select("doc_id").distinct().count() <= n_kept_docs
    assert out.count() > n_kept_docs  # chunking multiplies rows

    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val"}
    dirs = os.listdir(str(tmp_path / "corpus" / CorpusPipeline.CHUNKS))
    assert "split=train" in dirs and "split=val" in dirs

    # every chunk is ≤ 20 tokens and non-empty
    bad = out.filter(
        (F.size(F.split("chunk_text", " ")) > 20) | (F.length("chunk_text") == 0)
    ).count()
    assert bad == 0


def test_pipeline_runs_and_is_idempotent(spark, tmp_path):
    from northwind_warehouse_spark.plans.pipeline import WarehousePipeline

    p = WarehousePipeline(spark, str(tmp_path / "lake"))
    p.run(SF_SMOKE)

    dim1 = _dim_rows(p.table(p.DIM_USERS))
    fact1 = p.table(p.FACT_ORDERS).count()
    assert dim1 and fact1 > 0
    assert p.audit.get(p.DIM_USERS).is_processed

    # second run with no new data: nothing changes
    p.run(SF_SMOKE)
    assert _dim_rows(p.table(p.DIM_USERS)) == dim1
    assert p.table(p.FACT_ORDERS).count() == fact1

    # facts are partitioned for pruning (inside the latest version dir)
    import os

    versions = p._vt(p.FACT_ORDERS).versions()
    assert len(versions) >= 2  # one commit per run
    latest = versions[-1]["path"]
    years = [d for d in os.listdir(latest) if d.startswith("order_year=")]
    assert len(years) >= 5

    # time travel: the first run's fact version is still readable
    assert p.table(p.FACT_ORDERS, version=versions[0]["version"]).count() == fact1


def test_corpus_pipeline_pack_manifest(spark, tmp_path):
    """The pack manifest covers every chunk, offsets are contiguous per
    split, and pack cuts land every PACK_BUDGET tokens."""
    from northwind_warehouse_spark.plans.pipeline import CorpusPipeline
    from northwind_warehouse_spark.sources.lake import read_table

    p = CorpusPipeline(spark, str(tmp_path / "corpus"))
    chunks = p.run(SF_SMOKE)
    manifest = read_table(spark, str(tmp_path / "corpus" / CorpusPipeline.PACKS))
    assert manifest.count() == chunks.count()

    rows = manifest.orderBy("split", "doc_id", "chunk_idx").collect()
    offset = {}
    for r in rows:
        o = offset.get(r.split, 0)
        assert r.pack_id == o // CorpusPipeline.PACK_BUDGET
        assert r.offset_in_pack == o % CorpusPipeline.PACK_BUDGET
        offset[r.split] = o + r.n_tok
