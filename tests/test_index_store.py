"""Cross-session index-artifact lifecycle (round-8 verdict #1/#2,
round-10 verdict #1-#5).

The stored IVF-PQ index, trained coarse codebook and PQ codebook are
artifacts of a CORPUS VERSION: built by whichever session first sees a
corpus (occupancy-scaled two-level assignment, recall-GATED at
publish), adopted — with zero build jobs — by every later session,
maintained from the ingest stream as manifest-recorded GENERATIONS,
compacted crash-safely into revision tags, and vacuumed manifest-first
under a cross-process lock when a corpus rewrite supersedes them.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SF_SMOKE = "/root/testdata/sf0.001"

# Runs ann_ivfpq_from_index in a FRESH process with instrumented
# builders; prints the build-call counts and the full result rows.
# The artifact root arrives via $SPARK_GRAFT_INDEX_ROOT — the round-10
# parameterization (verdict #4): no module-attribute surgery, the env
# var is the production configuration surface.
_SESSION_SCRIPT = r"""
import json, sys
sf_dir = sys.argv[1]
import northwind_warehouse_spark.operators.similarity as sim
import northwind_warehouse_spark.plans.llm as L
calls = {"train": 0, "pq_codebook": 0, "pq_encode": 0}
_train, _pqcb, _enc = sim.ivf_train_codebook, sim.pq_codebook, sim.pq_encode
sim.ivf_train_codebook = lambda *a, **k: (calls.__setitem__("train", calls["train"] + 1), _train(*a, **k))[1]
sim.pq_codebook = lambda *a, **k: (calls.__setitem__("pq_codebook", calls["pq_codebook"] + 1), _pqcb(*a, **k))[1]
sim.pq_encode = lambda *a, **k: (calls.__setitem__("pq_encode", calls["pq_encode"] + 1), _enc(*a, **k))[1]
from northwind_warehouse_spark.session import get_spark
spark = get_spark("nws-xsession", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
df = L.ann_ivfpq_from_index(spark, sf_dir)
rows = [[r.query_id, r.cell_id, r.neighbor_id, r.adist, r.nn_rank] for r in df.collect()]
print("RESULT::" + json.dumps({"calls": calls, "rows": rows, "root": L._INDEX_ROOT}))
spark.stop()
"""


def _run_session(sf_dir: str, index_root: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_INDEX_ROOT=index_root)
    proc = subprocess.run(
        [sys.executable, "-c", _SESSION_SCRIPT, sf_dir],
        cwd=REPO, capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, f"session failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT::"))
    return json.loads(line[len("RESULT::"):])


@pytest.mark.slow
def test_second_session_adopts_index_with_zero_build_jobs(tmp_path):
    """Round-8 verdict #1 'done' criterion: session 1 builds and
    publishes (trains exactly once, encodes exactly once); session 2 —
    a FRESH process, empty catalog — serves the same corpus with ZERO
    builder invocations (no training, no PQ-codebook scan, no corpus
    encode) and byte-identical results, because it adopts the stored
    artifacts by identity tag. Both sessions take the artifact root
    from $SPARK_GRAFT_INDEX_ROOT (round-10 verdict #4), proving the
    parameterized root end to end."""
    root = str(tmp_path / "idx_root")
    first = _run_session(SF_SMOKE, root)
    assert first["calls"] == {"train": 1, "pq_codebook": 1, "pq_encode": 1}, first["calls"]
    assert len(first["rows"]) > 0
    assert first["root"] == root
    # artifacts really landed under the parameterized root
    assert (tmp_path / "idx_root" / "nws_ivfpq_index").is_dir()
    assert (tmp_path / "idx_root" / "nws_ivf_cb").is_dir()

    second = _run_session(SF_SMOKE, root)
    assert second["calls"] == {"train": 0, "pq_codebook": 0, "pq_encode": 0}, (
        "second session re-ran index builders instead of adopting: "
        f"{second['calls']}"
    )
    assert second["rows"] == first["rows"]


def _write_corpus(dst_dir: Path, max_vec_id: int | None = None) -> str:
    import duckdb

    dst_dir.mkdir(parents=True, exist_ok=True)
    pred = "" if max_vec_id is None else f"WHERE vec_id < {max_vec_id}"
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{SF_SMOKE}/embeddings.parquet') {pred}) "
        f"TO '{dst_dir}/embeddings.parquet' (FORMAT PARQUET)"
    )
    return str(dst_dir)


def _patch_roots(monkeypatch, tmp_path) -> None:
    import northwind_warehouse_spark.plans.llm as L

    monkeypatch.setattr(L, "_IVF_CB_ROOT", str(tmp_path / "cb"))
    monkeypatch.setattr(L, "_PQ_CB_ROOT", str(tmp_path / "pq"))
    monkeypatch.setattr(L, "_IVFPQ_ROOT", str(tmp_path / "idx"))


def test_gate_eval_ids_are_non_seed(tmp_path):
    """Round 12: the publish gate's eval batch must avoid the codebook
    SEEDS (the first k vec_ids — a seed query sits at the center of
    its own cell/super and grades the index at its optimistic end).
    [k, k+10) for any normally-sized corpus; a corpus too small for
    10 non-seed ids falls back toward the tail of its id range
    instead of crashing or silently evaluating zero queries."""
    import northwind_warehouse_spark.plans.llm as L

    sf = _write_corpus(tmp_path / "corpus", max_vec_id=50)
    k, _ = L._ivfpq_params(sf)
    lo, hi = L._gate_eval_ids(sf, k)
    assert (lo, hi) == (k, k + 10)  # first 10 non-seed ids
    assert lo >= k  # no seed id in the batch

    tiny = _write_corpus(tmp_path / "tiny", max_vec_id=12)
    k2, _ = L._ivfpq_params(tiny)
    lo2, hi2 = L._gate_eval_ids(tiny, k2)
    assert hi2 - lo2 == 10 and lo2 == 2  # tail fallback: ids [2, 12)
    assert hi2 <= 12  # every eval id exists in the corpus
    # r13 (r12 advice): the tail fallback overlaps [0, k2) — sub-(k+10)
    # corpora are knowingly gated partly on seeds (documented in the
    # docstring), but a corpus with < 2 rows has NO (query, neighbor)
    # pair — recall is undefined and the gate must refuse, not
    # divide by zero inside _publish_recall_gate.
    assert lo2 < k2  # the documented seed-overlap regime is real here
    import pytest as _pytest

    one = _write_corpus(tmp_path / "one", max_vec_id=1)
    with _pytest.raises(L.IndexRecallGateError, match="ungradable"):
        L._gate_eval_ids(one, 8)
    empty = _write_corpus(tmp_path / "empty", max_vec_id=0)
    with _pytest.raises(L.IndexRecallGateError, match="ungradable"):
        L._gate_eval_ids(empty, 8)


def test_corpus_rewrite_vacuums_superseded_artifacts(spark, tmp_path, monkeypatch):
    """Round-8 verdict #2 (+ round-10 #2 retention grace): rewriting
    the corpus must (a) serve a NEW index tag, (b) drop the superseded
    catalog table (manifest-first) while RETAINING its directory for
    the gc grace window, and (c) unpersist + evict the stale
    trained-codebook handle instead of leaking its pinned lineage."""
    import time

    import northwind_warehouse_spark.plans.llm as L
    from northwind_warehouse_spark.sources import index_store

    _patch_roots(monkeypatch, tmp_path)
    sf_dir = _write_corpus(tmp_path / "corpus")
    rows1 = L.ann_ivfpq_from_index(spark, sf_dir).collect()
    assert rows1

    corpus_path = f"{sf_dir}/embeddings.parquet"
    tag1 = index_store.read_manifest(str(tmp_path / "idx"))[corpus_path]
    assert (tmp_path / "idx" / tag1 / "_SUCCESS").is_file()
    k1, _ = L._ivfpq_params(sf_dir)
    cb1 = L._trained_cb(spark, sf_dir, k1)
    assert cb1.storageLevel.useMemory

    # corpus refresh: fewer rows -> new (mtime, size) -> new tag
    _write_corpus(tmp_path / "corpus", max_vec_id=50)
    rows2 = L.ann_ivfpq_from_index(spark, sf_dir).collect()
    assert rows2 and rows2 != rows1  # the rebuilt index reflects the rewrite

    manifest = index_store.read_manifest(str(tmp_path / "idx"))
    tag2 = manifest[corpus_path]
    assert tag2 != tag1
    # retention grace: the superseded dir is RETAINED (a concurrent
    # adopted reader may still be scanning it) and only the age-guarded
    # gc removes it
    assert index_store.is_published(str(tmp_path / "idx"), tag1), (
        "superseded index dir must stay servable through the grace window"
    )
    assert not spark.catalog.tableExists(f"nws_ivfpq_index_{tag1}"), (
        "superseded catalog table leaked"
    )
    old_t = time.time() - 7200
    os.utime(str(tmp_path / "idx" / tag1), (old_t, old_t))
    assert tag1 in index_store.gc_unreferenced(str(tmp_path / "idx"))
    assert not (tmp_path / "idx" / tag1).exists()
    assert (tmp_path / "idx" / tag2 / "_SUCCESS").is_file()
    # a fresh corpus version starts un-maintained
    assert index_store.manifest_generation(str(tmp_path / "idx"), corpus_path) == 0
    # stale codebook handle: unpersisted and evicted from the cache
    assert not cb1.storageLevel.useMemory, "stale trained-codebook still pinned"
    stale = [
        key for key, (_, df) in L._TRAINED_CBS.items()
        if key[0] == corpus_path and df is cb1
    ]
    assert not stale, "stale trained-codebook entry not evicted"
    # cleanup: drop the served table so later tests see a clean catalog
    spark.sql(f"DROP TABLE IF EXISTS nws_ivfpq_index_{tag2}")


def test_vacuum_is_manifest_first_with_retention_grace(tmp_path):
    """index_store.vacuum_superseded writes the manifest FIRST (the
    sources/versioned.py discipline) and RETAINS the superseded
    directory under the gc retention grace (round-10 verdict #2: an
    immediate rmtree could vanish a directory under a concurrent
    reader that adopted the old tag): the old dir stays complete, its
    mtime restarts the grace clock at supersession time, and only the
    age-guarded gc_unreferenced removes it."""
    import time

    from northwind_warehouse_spark.sources import index_store

    root = str(tmp_path / "store")
    for tag in ("t1", "t2"):
        os.makedirs(os.path.join(root, tag), exist_ok=True)
        Path(root, tag, "_SUCCESS").touch()
    # backdate t1's publish so the test can see vacuum RESTART the clock
    old = time.time() - 7200
    os.utime(os.path.join(root, "t1"), (old, old))

    assert index_store.vacuum_superseded(root, "corpus", "t1") is None
    assert index_store.read_manifest(root) == {"corpus": "t1"}
    assert index_store.is_published(root, "t1")

    # supersede: manifest points at t2; t1 RETAINED, complete, clock
    # restarted (an hour-old artifact superseded NOW must not be
    # instantly collectable)
    retired = index_store.vacuum_superseded(root, "corpus", "t2")
    assert retired == "t1"
    assert index_store.read_manifest(root) == {"corpus": "t2"}
    assert index_store.is_published(root, "t1"), "grace must keep t1 servable"
    assert index_store.is_published(root, "t2")
    assert index_store.gc_unreferenced(root, older_than_s=3600) == [], (
        "just-superseded dir collected inside its grace window"
    )

    # idempotent: re-vacuuming the current tag is a no-op
    assert index_store.vacuum_superseded(root, "corpus", "t2") is None
    assert index_store.is_published(root, "t2")

    # aged past the grace, gc collects exactly the unreferenced tag
    os.utime(os.path.join(root, "t1"), (old, old))
    assert index_store.gc_unreferenced(root, older_than_s=3600) == ["t1"]
    assert not os.path.exists(os.path.join(root, "t1"))
    assert index_store.is_published(root, "t2")


def test_publish_parquet_is_atomic_and_idempotent(spark, tmp_path):
    from northwind_warehouse_spark.sources import index_store

    root = str(tmp_path / "store")
    df = spark.range(0, 10).selectExpr("id AS vec_id")
    p1 = index_store.publish_parquet(df, root, "tag")
    assert index_store.is_published(root, "tag")
    mtime = os.stat(p1).st_mtime_ns
    # second publish of the same tag is a no-op (another session's
    # deterministic build already landed)
    index_store.publish_parquet(spark.range(0, 99).selectExpr("id AS vec_id"), root, "tag")
    assert os.stat(p1).st_mtime_ns == mtime
    assert spark.read.parquet(p1).count() == 10
    # no leftover temp build dirs
    assert [d for d in os.listdir(root) if ".build-" in d] == []


def test_promote_replaces_success_less_residue(spark, tmp_path):
    """Round-9 advice: a final directory WITHOUT _SUCCESS is crash
    residue (e.g. a partially rmtree'd vacuum leftover). _promote must
    replace it with the fresh complete build instead of silently
    discarding the good build and letting readers adopt partial data."""
    from northwind_warehouse_spark.sources import index_store

    root = str(tmp_path / "store")
    residue = Path(root, "tag")
    residue.mkdir(parents=True)
    (residue / "part-00000-stale.parquet").write_bytes(b"partial")
    assert not index_store.is_published(root, "tag")

    df = spark.range(0, 10).selectExpr("id AS vec_id")
    p = index_store.publish_parquet(df, root, "tag")
    assert index_store.is_published(root, "tag"), "fresh complete build was discarded"
    assert not (residue / "part-00000-stale.parquet").exists(), "residue file survived"
    assert spark.read.parquet(p).count() == 10


def test_promote_raises_on_unremovable_residue(spark, tmp_path, monkeypatch):
    """If the final directory is _SUCCESS-less residue that CANNOT be
    replaced (rename keeps failing, rmtree is ineffective), _promote
    must RAISE rather than return: a silent return hands the caller's
    adopt step an incomplete directory to serve as the artifact."""
    import pytest

    from northwind_warehouse_spark.sources import index_store

    root = str(tmp_path / "store")
    residue = Path(root, "tag")
    residue.mkdir(parents=True)
    (residue / "part-00000-stale.parquet").write_bytes(b"partial")

    def _always_fail_rename(src, dst):
        raise OSError("simulated: final recreated by a concurrent writer")

    def _ineffective_rmtree(path, ignore_errors=False):
        return None  # simulated: removal has no effect (permissions)

    monkeypatch.setattr(index_store.os, "rename", _always_fail_rename)
    monkeypatch.setattr(index_store.shutil, "rmtree", _ineffective_rmtree)
    tmp = str(tmp_path / "store" / "tag.build-1")
    Path(tmp).mkdir()
    with pytest.raises(RuntimeError, match="could not publish"):
        index_store._promote(tmp, str(residue))
    assert not index_store.is_published(root, "tag")


def test_manifest_lock_serializes_cross_process_updates(tmp_path):
    """Round-9 advice: unlocked read-modify-writes from two processes
    vacuuming DIFFERENT keys could interleave and lose one key's entry
    (after which gc would collect its live artifact). Hammer the
    manifest from concurrent processes and assert no entry is lost."""
    root = str(tmp_path / "store")
    n_procs, n_keys = 4, 12
    script = (
        "import sys\n"
        "from northwind_warehouse_spark.sources import index_store\n"
        "root, pid = sys.argv[1], sys.argv[2]\n"
        f"for i in range({n_keys}):\n"
        "    index_store.vacuum_superseded(root, f'key-{pid}-{i}', f'tag-{pid}-{i}')\n"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, root, str(p)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for p in range(n_procs)
    ]
    for p in procs:
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[-2000:]

    from northwind_warehouse_spark.sources import index_store

    manifest = index_store.read_manifest(root)
    want = {f"key-{p}-{i}" for p in range(n_procs) for i in range(n_keys)}
    assert set(manifest) == want, f"lost {sorted(want - set(manifest))}"


def _current_index_table(idx_root: str, corpus_path: str) -> str:
    from northwind_warehouse_spark.sources import index_store

    return f"nws_ivfpq_index_{index_store.read_manifest(idx_root)[corpus_path]}"


def _append_generation(spark, table: str, gen: int, n_buckets: int, rows_df) -> None:
    (
        rows_df.write.mode("append").format("parquet")
        .partitionBy("gen")
        .bucketBy(n_buckets, "cell_id")
        .sortBy("cell_id", "vec_id")
        .saveAsTable(table)
    )


def test_compaction_restores_one_file_per_bucket(spark, tmp_path, monkeypatch):
    """The OPTIMIZE step of the maintenance story: streaming appends
    leave one file per (micro-batch, bucket); compact_bucketed_table
    must rewrite the stored index to ONE file per (generation, bucket)
    — published as a NEW revision tag, manifest-first (round-10
    verdict #2: no in-place directory swap) — with rows, generations,
    serving results, and the zero-Exchange bucket contract all
    preserved."""
    from pyspark.sql import functions as F

    import northwind_warehouse_spark.plans.llm as L
    from northwind_warehouse_spark.sources import index_store

    _patch_roots(monkeypatch, tmp_path)
    sf_dir = _write_corpus(tmp_path / "corpus")
    idx_root = str(tmp_path / "idx")

    rows_before_appends = L.ann_ivfpq_from_index(spark, sf_dir).collect()
    corpus_path = f"{sf_dir}/embeddings.parquet"
    tag0 = index_store.read_manifest(idx_root)[corpus_path]
    table = f"nws_ivfpq_index_{tag0}"
    _, nb = L._ivfpq_params(sf_dir)

    # simulate streaming maintenance residue: several tiny bucketed
    # appends of already-indexed-shape rows with UNSEEN vec_ids, in a
    # maintained generation (gen=1) exactly as the maintain stream
    # writes them
    base = spark.table(table)
    n0 = base.count()
    for i in range(8):
        _append_generation(
            spark, table, 1, nb,
            base.limit(5).select(
                (F.col("vec_id") + F.lit(1_000_000 * (i + 1))).alias("vec_id"),
                "cell_id", "codes", F.lit(1).alias("gen"),
            ),
        )
    want_rows = {
        (r.vec_id, r.cell_id, tuple(r.codes), r.gen)
        for r in spark.table(table).collect()
    }
    assert len(want_rows) == n0 + 40

    stats = L.ivfpq_compact_index(spark, sf_dir)
    assert stats["files_after"] < stats["files_before"], stats
    assert stats["files_after"] <= 2 * nb, stats  # one file per (gen, bucket)
    assert stats["old_tag"] == tag0
    new_tag = stats["new_tag"]
    assert new_tag != tag0 and index_store.base_tag(new_tag) == tag0

    # the swap is a manifest retarget, never an in-place rewrite: old
    # table dropped, new tag served, generation preserved; the old dir
    # is RETAINED complete for the gc retention grace (r11 — concurrent
    # adopted readers must never lose their directory mid-scan)
    assert index_store.read_manifest(idx_root)[corpus_path] == new_tag
    assert index_store.is_published(idx_root, tag0)
    import time as _time

    _old_t = _time.time() - 7200
    os.utime(str(tmp_path / "idx" / tag0), (_old_t, _old_t))
    assert tag0 in index_store.gc_unreferenced(idx_root)
    assert not (tmp_path / "idx" / tag0).exists()
    assert not spark.catalog.tableExists(table)
    new_table = f"nws_ivfpq_index_{new_tag}"
    got_rows = {
        (r.vec_id, r.cell_id, tuple(r.codes), r.gen)
        for r in spark.table(new_table).collect()
    }
    assert got_rows == want_rows

    # bucket contract survives the rewrite: zero-Exchange cell-grain agg
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = spark.table(new_table).groupBy("cell_id").agg(F.count(F.lit(1)).alias("n"))
        agg.collect()
        assert "Exchange" not in agg._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # registered serving is gen-0 by contract: appended vec_ids are in
    # gen=1, so the query output is EXACTLY what it was before appends
    rows_after = L.ann_ivfpq_from_index(spark, sf_dir).collect()
    assert rows_after == rows_before_appends
    spark.sql(f"DROP TABLE IF EXISTS {new_table}")


def test_compaction_crash_windows_leave_servable_index(spark, tmp_path, monkeypatch):
    """Round-9/10 verdict #2 'done' criterion: a crash BEFORE the
    compaction's manifest retarget leaves the old revision fully
    served and the new dir a gc-collectable orphan; AFTER the retarget
    (the normal post-vacuum state under the r11 retention grace) the
    new revision serves while the old dir stays complete until the
    age-guarded gc collects it — never a manifest pointing at a
    missing or half-written directory, never a directory vanishing
    under a concurrent adopted reader."""
    import time

    import northwind_warehouse_spark.plans.llm as L
    from northwind_warehouse_spark.sources import index_store

    _patch_roots(monkeypatch, tmp_path)
    sf_dir = _write_corpus(tmp_path / "corpus")
    idx_root = str(tmp_path / "idx")
    corpus_path = f"{sf_dir}/embeddings.parquet"

    rows0 = L.ann_ivfpq_from_index(spark, sf_dir).collect()
    tag0 = index_store.read_manifest(idx_root)[corpus_path]

    # window A: crash AFTER the new revision publishes, BEFORE the
    # manifest retargets — old revision stays served, new dir orphans
    real_vacuum = index_store.vacuum_superseded

    def _crash_before_retarget(*a, **k):
        raise RuntimeError("injected crash before manifest retarget")

    monkeypatch.setattr(index_store, "vacuum_superseded", _crash_before_retarget)
    with pytest.raises(RuntimeError, match="injected crash"):
        L.ivfpq_compact_index(spark, sf_dir)
    monkeypatch.setattr(index_store, "vacuum_superseded", real_vacuum)
    assert index_store.read_manifest(idx_root)[corpus_path] == tag0
    assert index_store.is_published(idx_root, tag0)
    assert L.ann_ivfpq_from_index(spark, sf_dir).collect() == rows0
    orphan_a = f"{tag0}_r1"
    assert index_store.is_published(idx_root, orphan_a), "orphan must be complete"
    old = time.time() - 7200
    os.utime(os.path.join(idx_root, orphan_a), (old, old))
    assert orphan_a in index_store.gc_unreferenced(idx_root)
    # the orphan's adopted catalog table is stale residue of the crash;
    # a real restart has an empty catalog — mirror that here
    spark.sql(f"DROP TABLE IF EXISTS nws_ivfpq_index_{orphan_a}")

    # window B: a crash (or just a pause) AFTER the manifest retargets
    # — under the retention grace this is the NORMAL post-vacuum state:
    # new revision served, old revision RETAINED complete until the
    # age-guarded gc collects it
    L.ivfpq_compact_index(spark, sf_dir)
    tag1 = index_store.read_manifest(idx_root)[corpus_path]
    assert tag1 == f"{tag0}_r1" and index_store.is_published(idx_root, tag1)
    assert L.ann_ivfpq_from_index(spark, sf_dir).collect() == rows0
    assert index_store.is_published(idx_root, tag0), (
        "superseded revision must stay complete through the grace window"
    )
    assert index_store.gc_unreferenced(idx_root, older_than_s=3600) == [], (
        "grace clock must restart at supersession, not publish, time"
    )
    os.utime(os.path.join(idx_root, tag0), (old, old))
    assert tag0 in index_store.gc_unreferenced(idx_root)
    spark.sql(f"DROP TABLE IF EXISTS nws_ivfpq_index_{tag1}")


def test_concurrent_reader_of_superseded_tag_survives_vacuum(spark, tmp_path, monkeypatch):
    """Round-10 verdict #2 'done' criterion, two sessions: a reader
    process resolves the manifest to the CURRENT tag, then the writer
    compacts (publishing a new revision and vacuuming the old tag),
    and ONLY THEN does the reader scan the directory it adopted — the
    scan must succeed, because vacuum retains superseded directories
    under the gc retention grace instead of rmtree'ing them out from
    under in-flight readers. Once aged past the grace, gc collects."""
    import time

    import northwind_warehouse_spark.plans.llm as L
    from northwind_warehouse_spark.sources import index_store

    _patch_roots(monkeypatch, tmp_path)
    sf_dir = _write_corpus(tmp_path / "corpus")
    idx_root = str(tmp_path / "idx")
    corpus_path = f"{sf_dir}/embeddings.parquet"

    L.ann_ivfpq_from_index(spark, sf_dir).collect()  # build + publish
    tag0 = index_store.read_manifest(idx_root)[corpus_path]

    flags = tmp_path / "flags"
    flags.mkdir()
    reader_script = (
        "import glob, os, sys, time\n"
        "import duckdb\n"
        "from northwind_warehouse_spark.sources import index_store\n"
        "idx_root, key, flags = sys.argv[1], sys.argv[2], sys.argv[3]\n"
        "tag = index_store.read_manifest(idx_root)[key]\n"
        "adopted_dir = os.path.join(idx_root, tag)\n"
        # atomic flag write: the parent polls for this file's EXISTENCE,
        # and a plain open(...).write() creates it before the buffered
        # content is flushed at close — under suite load the parent can
        # read an empty string (observed r13). Write-then-rename closes
        # that window.
        "with open(os.path.join(flags, 'adopted.tmp'), 'w') as fh:\n"
        "    fh.write(tag)\n"
        "os.replace(os.path.join(flags, 'adopted.tmp'), os.path.join(flags, 'adopted'))\n"
        "for _ in range(600):\n"
        "    if os.path.exists(os.path.join(flags, 'vacuumed')):\n"
        "        break\n"
        "    time.sleep(0.1)\n"
        "else:\n"
        "    raise SystemExit('writer never vacuumed')\n"
        "n = duckdb.sql(\n"
        "    f\"SELECT count(*) FROM read_parquet('{adopted_dir}/**/*.parquet')\"\n"
        ").fetchone()[0]\n"
        "print(f'READER::{tag}::{n}')\n"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", reader_script, idx_root, corpus_path, str(flags)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        for _ in range(600):
            if (flags / "adopted").exists():
                break
            time.sleep(0.1)
        else:
            pytest.fail("reader never adopted a tag")
        assert (flags / "adopted").read_text() == tag0

        # writer: compact → new revision published, tag0 vacuumed
        out = L.ivfpq_compact_index(spark, sf_dir)
        assert out["old_tag"] == tag0 and out["new_tag"] == f"{tag0}_r1"
        (flags / "vacuumed").touch()

        stdout, stderr = proc.communicate(timeout=120)
        assert proc.returncode == 0, f"reader died:\n{stdout[-2000:]}\n{stderr[-2000:]}"
        line = next(l for l in stdout.splitlines() if l.startswith("READER::"))
        _, read_tag, n_rows = line.split("::")
        assert read_tag == tag0 and int(n_rows) > 0, (
            "reader's post-vacuum scan of the superseded dir failed"
        )
    finally:
        if proc.poll() is None:
            proc.kill()

    # aged past the grace, the superseded revision is collectable
    old_t = time.time() - 7200
    os.utime(os.path.join(idx_root, tag0), (old_t, old_t))
    assert tag0 in index_store.gc_unreferenced(idx_root)
    spark.sql(f"DROP TABLE IF EXISTS nws_ivfpq_index_{tag0}_r1")


def test_maintenance_is_a_generation_and_registered_serving_stays_build_identical(
    spark, tmp_path, monkeypatch
):
    """Round-10 verdict #3 'done' criterion, against the PRODUCTION
    root layout (tmp-monkeypatched roots, same code path): a
    maintain-stream run must (a) bump the manifest GENERATION, (b) land
    its appends in the gen=<N> partition so the maintained view serves
    them, and (c) leave the REGISTERED serving query oracle-green —
    the stored tag's gen-0 content remains exactly build(corpus file),
    which is what the DuckDB oracle computes."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    import northwind_warehouse_spark.plans.llm as L
    from northwind_warehouse_spark.catalog import load
    from northwind_warehouse_spark.sources import index_store
    from tests.oracle_util import compare

    _patch_roots(monkeypatch, tmp_path)
    idx_root = str(tmp_path / "idx")
    sf_dir = SF_SMOKE  # real corpus: the oracle needs every table
    corpus_path = f"{sf_dir}/embeddings.parquet"
    # the identity tag is root-independent: evict any catalog entry an
    # earlier test registered against the production root, so this
    # test's index really lives under the patched root
    spark.sql(f"DROP TABLE IF EXISTS nws_ivfpq_index_{L._ivfpq_identity_tag(sf_dir)}")

    base_rows = L._ivfpq_index(spark, sf_dir).count()
    assert index_store.manifest_generation(idx_root, corpus_path) == 0

    e = load(spark, sf_dir, "embeddings")
    new = e.filter(F.col("vec_id") >= 490).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding"
    )
    src = str(tmp_path / "stream_src")
    new.coalesce(1).write.mode("overwrite").parquet(src)
    incoming = spark.readStream.schema(new.schema).parquet(src)
    q, gen = L.ivfpq_maintain_from_stream(
        spark, sf_dir, incoming, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    n_new = new.count()

    # (a) the manifest records the maintenance run
    assert gen == 1
    assert index_store.manifest_generation(idx_root, corpus_path) == 1
    # (b) the maintained view serves the appends; gen 0 is untouched
    assert L._ivfpq_index_maintained(spark, sf_dir).count() == base_rows + n_new
    assert L._ivfpq_index(spark, sf_dir).count() == base_rows
    # ...and the appended rows are in the gen=1 partition
    tbl, _ = L._ivfpq_table(spark, sf_dir)
    assert tbl.filter(F.col("gen") == 1).count() == n_new
    # (c) the registered query still matches its oracle AFTER maintenance
    probs = compare(
        L.ann_ivfpq_from_index(spark, sf_dir),
        E.oracle_sql()["ann_ivfpq_from_index"],
        sf_dir,
    )
    assert not probs, f"registered serving diverged after maintenance: {probs}"
    spark.sql(f"DROP TABLE IF EXISTS {_current_index_table(idx_root, corpus_path)}")


def test_publish_refuses_planted_low_recall_index(spark, tmp_path, monkeypatch):
    """Round-10 verdict #5 'done' criterion: the publish-time accept
    gate must REFUSE an index whose assignment is broken (every corpus
    vector mis-filed into a cell no query probes ⇒ candidate recall 0)
    — nothing published, no _SUCCESS, no manifest entry — while the
    production publish (the other tests in this file) stays green."""
    import northwind_warehouse_spark.operators.similarity as sim
    import northwind_warehouse_spark.plans.llm as L
    from pyspark.sql import functions as F

    _patch_roots(monkeypatch, tmp_path)
    sf_dir = _write_corpus(tmp_path / "corpus")
    idx_root = str(tmp_path / "idx")

    real = sim.ivf_assign_two_level

    def mis_assign(*a, **k):
        return real(*a, **k).withColumn("cell_id", F.lit(1_000_000).cast("bigint"))

    monkeypatch.setattr(L.sim, "ivf_assign_two_level", mis_assign)
    with pytest.raises(L.IndexRecallGateError, match="publish refused"):
        L._ivfpq_table(spark, sf_dir)
    # nothing leaked: no published artifact, no manifest entry
    from northwind_warehouse_spark.sources import index_store

    assert index_store.read_manifest(idx_root).get(f"{sf_dir}/embeddings.parquet") is None
    tags = os.listdir(idx_root) if os.path.isdir(idx_root) else []
    assert not any(index_store.is_published(idx_root, t) for t in tags), tags
    assert not spark.catalog.tableExists(
        f"nws_ivfpq_index_{L._ivfpq_identity_tag(sf_dir)}"
    )


def test_gate_recall_matches_sweep_measurement(spark, tmp_path, monkeypatch):
    """Round 12: the floor `_ivfpq_min_recall_ppm` is CALIBRATED by
    tools/nprobe_probe.py::measure() and ENFORCED by
    `_publish_recall_gate` — two independent implementations of the
    same candidate-recall@5 measurement (different candidate-join and
    truth plumbing). If they ever drift, the gate enforces a floor its
    calibration never measured. Build a fresh index (capturing the ppm
    the gate actually computed), run the sweep's measure() on the same
    corpus at the gate's own protocol (non-seed [k, k+10) queries,
    flat route, P(k)), and assert the IDENTICAL ppm."""
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    import nprobe_probe as NP

    import northwind_warehouse_spark.plans.llm as L

    _patch_roots(monkeypatch, tmp_path)
    sf_dir = _write_corpus(tmp_path / "corpus")
    k, _ = L._ivfpq_params(sf_dir)

    gate_ppm: dict = {}
    real_gate = L._publish_recall_gate

    def capture(spark_, sf, assigned, k_):
        gate_ppm["v"] = real_gate(spark_, sf, assigned, k_)
        return gate_ppm["v"]

    monkeypatch.setattr(L, "_publish_recall_gate", capture)
    L._ivfpq_table(spark, sf_dir)  # fresh root → builds → gate runs
    assert "v" in gate_ppm, "fresh build did not run the publish gate"

    p = L._idx_nprobe(k)
    m = NP.measure(
        spark, sf_dir, probes=(p,), supers=(),
        query_ids=L._gate_eval_ids(sf_dir, k),
    )
    assert gate_ppm["v"] == m["routes"]["flat"][str(p)]["recall_ppm"]


# Session A: build + publish, absorb a stream of new vectors into the
# stored table as a manifest-recorded GENERATION, compact bucket-locally
# (publishing a revision tag), serve. Session B (fresh process): adopt
# everything with zero builder invocations and serve the SAME results —
# registered serving from gen 0, maintained serving including the
# appends.
_LIFECYCLE_SCRIPT = r"""
import json, sys
sf_dir, phase = sys.argv[1:3]
import northwind_warehouse_spark.operators.similarity as sim
import northwind_warehouse_spark.plans.llm as L
calls = {"train": 0, "pq_codebook": 0}
_train, _pqcb = sim.ivf_train_codebook, sim.pq_codebook
sim.ivf_train_codebook = lambda *a, **k: (calls.__setitem__("train", calls["train"] + 1), _train(*a, **k))[1]
sim.pq_codebook = lambda *a, **k: (calls.__setitem__("pq_codebook", calls["pq_codebook"] + 1), _pqcb(*a, **k))[1]
from northwind_warehouse_spark.session import get_spark
spark = get_spark("nws-lifecycle", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
from northwind_warehouse_spark.sources import index_store
idx_root = L._IVFPQ_ROOT
out = {"calls": calls}
if phase == "build_absorb_compact":
    from pyspark.sql import functions as F
    from northwind_warehouse_spark.catalog import load
    L.ann_ivfpq_from_index(spark, sf_dir).collect()   # build + publish
    e = load(spark, sf_dir, "embeddings")
    new = e.filter(F.col("vec_id") >= 90).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding")
    src = f"{idx_root}/_stream_src"
    new.coalesce(1).write.mode("overwrite").parquet(src)
    incoming = spark.readStream.schema(new.schema).parquet(src)
    q, gen = L.ivfpq_maintain_from_stream(spark, sf_dir, incoming, f"{idx_root}/_ckpt")
    q.awaitTermination(120)
    out["gen"] = gen
    out["compact"] = {k: v for k, v in L.ivfpq_compact_index(spark, sf_dir).items()}
out["maintained_rows"] = L._ivfpq_index_maintained(spark, sf_dir).count()
out["gen0_rows"] = L._ivfpq_index(spark, sf_dir).count()
rows = [list(r) for r in L.ann_ivfpq_multiprobe_from_index(spark, sf_dir).collect()]
out["rows"] = rows
print("RESULT::" + json.dumps(out))
spark.stop()
"""


@pytest.mark.slow
def test_full_lifecycle_outlives_session_absorbs_stream_serves_multiprobe(tmp_path):
    """The round-8 verdict's closing sentence, as one flow: the stored
    artifact OUTLIVES the session, ABSORBS the stream (maintain appends
    as a manifest-recorded generation), CLEANS UP after itself
    (compaction into a crash-safe revision tag), and SERVES MULTI-PROBE
    — a fresh process then adopts all of it with zero builder
    invocations, sees the same maintained row count, and returns the
    identical multi-probe results (gen-0 serving, so maintenance never
    silently changes a registered query's output)."""
    root = str(tmp_path / "idx_root")
    sf_dir = _write_corpus(tmp_path / "corpus")

    def run(phase: str) -> dict:
        env = dict(os.environ, SPARK_GRAFT_INDEX_ROOT=root)
        proc = subprocess.run(
            [sys.executable, "-c", _LIFECYCLE_SCRIPT, sf_dir, phase],
            cwd=REPO, capture_output=True, text=True, timeout=600, env=env,
        )
        assert proc.returncode == 0, f"{phase} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT::"))
        return json.loads(line[len("RESULT::"):])

    a = run("build_absorb_compact")
    assert a["calls"]["train"] == 1 and a["calls"]["pq_codebook"] == 1, a["calls"]
    assert a["gen"] == 1
    assert a["compact"]["new_tag"].endswith("_r1"), a["compact"]
    assert a["maintained_rows"] > a["gen0_rows"] > 0
    assert len(a["rows"]) > 0

    b = run("serve_only")
    assert b["calls"] == {"train": 0, "pq_codebook": 0}, (
        "fresh session re-ran builders instead of adopting the "
        f"maintained+compacted index: {b['calls']}"
    )
    assert b["rows"] == a["rows"], "adopted serving diverged from the maintaining session"
    assert b["maintained_rows"] == a["maintained_rows"]
    assert b["gen0_rows"] == a["gen0_rows"]


def test_gc_unreferenced_respects_manifest_and_age(tmp_path):
    """gc_unreferenced removes only artifact dirs that are BOTH
    unreferenced by the manifest AND older than the age guard — a
    mid-flight publisher (fresh dir, or a .build temp) is never
    collected."""
    import time

    from northwind_warehouse_spark.sources import index_store

    root = str(tmp_path / "store")
    for tag in ("current", "orphan_old", "orphan_fresh"):
        os.makedirs(os.path.join(root, tag))
        Path(root, tag, "_SUCCESS").touch()
    os.makedirs(os.path.join(root, "t.build-123"))
    index_store.vacuum_superseded(root, "corpus", "current")
    old = time.time() - 7200
    os.utime(os.path.join(root, "orphan_old"), (old, old))
    os.utime(os.path.join(root, "t.build-123"), (old, old))

    removed = index_store.gc_unreferenced(root)
    assert sorted(removed) == ["orphan_old", "t.build-123"]
    left = sorted(os.listdir(root))
    assert "current" in left and "orphan_fresh" in left
    assert "orphan_old" not in left and "t.build-123" not in left


def test_manifest_invariants_under_random_publish_vacuum_sequences(tmp_path):
    """Property: under ANY interleaving of publish+vacuum+generation
    bumps across keys, (a) the manifest always points each key at its
    latest tag, (b) every referenced tag's artifact exists and is
    published, (c) generations bump monotonically per key and reset on
    supersede, (d) no referenced artifact is ever removed — by vacuum
    OR by the age-guarded gc — and (e) gc leaves exactly the referenced
    set among old directories."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from northwind_warehouse_spark.sources import index_store

    ops = st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2", "k3"]),
            st.integers(0, 9),
            st.booleans(),  # also bump a generation after this publish?
        ),
        min_size=1, max_size=25,
    )

    counter = [0]

    @settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(ops)
    def run(seq):
        counter[0] += 1
        root = str(tmp_path / f"store{counter[0]}")
        latest: dict[str, str] = {}
        gens: dict[str, int] = {}
        for key, n, bump in seq:
            tag = f"{key}-t{n}"
            # publish (the mkdir+_SUCCESS state publish_parquet promotes to)
            os.makedirs(os.path.join(root, tag), exist_ok=True)
            Path(root, tag, "_SUCCESS").touch()
            if latest.get(key) != tag:
                index_store.vacuum_superseded(root, key, tag)
                gens[key] = 0  # a fresh tag starts un-maintained
            latest[key] = tag
            if bump:
                gens[key] = index_store.bump_generation(root, key)
            manifest = index_store.read_manifest(root)
            assert manifest == latest
            for k2, t2 in manifest.items():
                assert index_store.is_published(root, t2), (t2, sorted(os.listdir(root)))
                assert index_store.manifest_generation(root, k2) == gens[k2]
        # age everything, then gc: referenced tags must survive,
        # everything else must go
        for name in os.listdir(root):
            p = os.path.join(root, name)
            if os.path.isdir(p):
                os.utime(p, (1, 1))
        index_store.gc_unreferenced(root, older_than_s=3600)
        dirs = {n for n in os.listdir(root) if os.path.isdir(os.path.join(root, n))}
        assert dirs == set(latest.values())

    run()
