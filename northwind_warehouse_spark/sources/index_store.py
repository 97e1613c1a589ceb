"""Cross-session index artifact store — build once per CORPUS REFRESH,
adopt everywhere.

An ANN index (coarse codebook, PQ codebook, encoded vector table) is an
artifact of a corpus VERSION, not of a Spark session: at 100 TB the
whole point of persisting it is that no later session ever re-scans the
corpus to recreate it. This module gives index producers the same
lifecycle discipline the lake sources already have:

- **Content-identity tags.** Artifacts live at ``<root>/<tag>`` where
  the tag hashes the corpus file identity (path, mtime, size — the
  ``catalog.table_rows`` convention). Deterministic builders mean a
  stored artifact is value-identical to a rebuild, so adoption is
  observationally equal to retraining.
- **Atomic publish.** Builders write to a pid-suffixed temp directory
  and ``os.rename`` into place; a concurrent publisher of the same tag
  loses the race harmlessly (identical content) and discards its copy.
  Readers only ever see a complete artifact (``_SUCCESS`` present).
- **Adopt, never rebuild.** ``ensure_bucketed_table`` registers a
  published bucketed artifact in a fresh session's catalog with a
  ``CREATE TABLE ... CLUSTERED BY ... LOCATION`` DDL — zero data jobs;
  the bucket ids come from the file names the original
  ``write_bucketed`` produced, so co-located reads stay shuffle-free
  across sessions (asserted in tests/test_index_store.py).
- **Manifest-first vacuum.** ``<root>/MANIFEST.json`` maps each logical
  key (corpus path [+ parameters]) to its CURRENT tag. Publishing a new
  tag updates the manifest BEFORE removing the superseded tag's
  directory and catalog entry — the ``sources/versioned.py::vacuum``
  discipline: a crash between the two steps leaves an unreferenced
  directory (harmless, re-vacuumable), never a manifest pointing at
  removed files.

Reference parity: the reference warehouse materializes models as
persistent tables that survive runs and rebuilds incrementally
(models/dwh/fact_order.sql is ``materialized='incremental'`` precisely
so nothing re-scans from scratch); this module is that discipline
applied to index state.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from northwind_warehouse_spark.sources.bucketing import write_bucketed


def is_published(root: str, tag: str) -> bool:
    """A tag is published when its directory carries the _SUCCESS marker
    (Spark writes it last, so presence ⇒ the artifact is complete)."""
    return os.path.isfile(os.path.join(root, tag, "_SUCCESS"))


def _promote(tmp: str, final: str) -> None:
    """Atomically move a complete temp build into place; if another
    publisher won the race (deterministic build ⇒ identical content),
    discard ours."""
    if is_published(os.path.dirname(final), os.path.basename(final)):
        shutil.rmtree(tmp, ignore_errors=True)
        return
    try:
        os.rename(tmp, final)
    except OSError:
        # final appeared between the check and the rename — lost race
        shutil.rmtree(tmp, ignore_errors=True)


def publish_parquet(df: DataFrame, root: str, tag: str) -> str:
    """Publish ``df`` as a plain parquet artifact at ``<root>/<tag>``
    (atomic tmp + rename). No-op if the tag is already published.
    Returns the artifact path."""
    final = os.path.join(root, tag)
    if not is_published(root, tag):
        os.makedirs(root, exist_ok=True)
        tmp = f"{final}.build-{os.getpid()}"
        df.write.mode("overwrite").parquet(tmp)
        _promote(tmp, final)
    return final


def _manifest_path(root: str) -> str:
    return os.path.join(root, "MANIFEST.json")


def read_manifest(root: str) -> dict[str, str]:
    try:
        with open(_manifest_path(root)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def vacuum_superseded(
    root: str,
    key: str,
    new_tag: str,
    spark: SparkSession | None = None,
    table_prefix: str | None = None,
) -> str | None:
    """Point the manifest's ``key`` at ``new_tag`` and remove the
    superseded tag's artifact: manifest FIRST (crash-safe — see module
    docstring), then the old catalog table (this session's catalog; an
    in-memory catalog is per-session anyway) and the old directory.
    Returns the vacuumed tag, or None if nothing was superseded."""
    os.makedirs(root, exist_ok=True)
    manifest = read_manifest(root)
    old = manifest.get(key)
    if old == new_tag:
        return None
    manifest[key] = new_tag
    tmp = _manifest_path(root) + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(root))
    if old is None:
        return None
    if spark is not None and table_prefix is not None:
        spark.sql(f"DROP TABLE IF EXISTS {table_prefix}{old}")
    shutil.rmtree(os.path.join(root, old), ignore_errors=True)
    return old


def gc_unreferenced(root: str, older_than_s: float = 3600.0) -> list[str]:
    """Remove artifact directories no manifest entry references — the
    backstop for the two ways an unreferenced dir can exist: a vacuum
    interrupted between its manifest write and its rmtree (the
    documented crash window), and tags from retired keying schemes.

    Only DIRECTORIES OLDER than ``older_than_s`` are collected: a
    concurrent publisher sits briefly in the published-but-not-yet-
    manifested window, and its ``.build-<pid>`` temp dirs are still
    being written — age is the guard against collecting either
    mid-flight. Returns the removed tag names. Deliberate manual/cron
    maintenance, never called implicitly (same stance as
    sources/versioned.py::vacuum)."""
    import time

    removed: list[str] = []
    if not os.path.isdir(root):
        return removed
    referenced = set(read_manifest(root).values())
    now = time.time()
    for name in os.listdir(root):
        p = os.path.join(root, name)
        if (
            not os.path.isdir(p)
            or name in referenced
            or now - os.stat(p).st_mtime < older_than_s
        ):
            continue
        shutil.rmtree(p, ignore_errors=True)
        removed.append(name)
    return removed


def ensure_bucketed_table(
    spark: SparkSession,
    table: str,
    root: str,
    tag: str,
    build_df: Callable[[], DataFrame],
    schema_ddl: str,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str],
    n_buckets: int,
    manifest_key: str | None = None,
    table_prefix: str | None = None,
) -> DataFrame:
    """Serve the bucketed artifact ``<root>/<tag>`` as catalog table
    ``table``, building it only if no session has published it yet.

    Three tiers, cheapest first: (1) the table is already in THIS
    session's catalog → return it (zero work); (2) the artifact is
    published on disk → ADOPT it with a CREATE TABLE ... CLUSTERED BY
    ... LOCATION DDL (zero data jobs — the cross-session path); (3)
    nothing exists → run ``build_df()`` once, write it bucketed via a
    throwaway external table bound to a temp location, drop the binding
    (external ⇒ files survive), promote atomically, then adopt.

    ``manifest_key`` enables supersede-vacuum: after serving the new
    tag, any older tag recorded for the key is dropped from the catalog
    (``table_prefix + old_tag``) and removed from disk, manifest-first.
    """
    if not spark.catalog.tableExists(table):
        if not is_published(root, tag):
            os.makedirs(root, exist_ok=True)
            final = os.path.join(root, tag)
            tmp = f"{final}.build-{os.getpid()}"
            build_tbl = f"{table}__build_{os.getpid()}"
            spark.sql(f"DROP TABLE IF EXISTS {build_tbl}")
            write_bucketed(
                build_df(), build_tbl, list(bucket_cols),
                n_buckets=n_buckets, sort_cols=list(sort_cols), path=tmp,
            )
            spark.sql(f"DROP TABLE {build_tbl}")
            _promote(tmp, final)
        spark.sql(
            f"CREATE TABLE {table} ({schema_ddl}) USING PARQUET "
            f"CLUSTERED BY ({', '.join(bucket_cols)}) "
            f"SORTED BY ({', '.join(sort_cols)}) INTO {n_buckets} BUCKETS "
            f"LOCATION '{os.path.join(root, tag)}'"
        )
    if manifest_key is not None:
        vacuum_superseded(root, manifest_key, tag, spark=spark, table_prefix=table_prefix)
    return spark.table(table)


def _count_parquet_files(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_bucketed_table(
    spark: SparkSession,
    table: str,
    root: str,
    tag: str,
    schema_ddl: str,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str],
    n_buckets: int,
) -> dict:
    """Per-bucket small-files compaction for a stored bucketed index —
    the OPTIMIZE step of the maintenance story: every streaming append
    (ivf_pq_index_maintain_stream) adds one file per (micro-batch,
    bucket), and at 100 TB the footer/open overhead of thousands of
    KB-scale bucket files dominates the serving scan.

    The rewrite is BUCKET-LOCAL — zero Exchange: the bucketed scan is
    FORCED (autoBucketedScan normally disables it for plain scans
    because no join/agg consumes the distribution — exactly backwards
    here, where the distribution IS the point: with it disabled the
    read degrades to one task per small file and the writer faithfully
    reproduces the fragmentation), so each task receives exactly one
    bucket's file group and the writer emits ONE file per non-empty
    bucket, sorted by ``sort_cols``. The swap is the
    ``lake.compact_table`` discipline (write beside, swap directories,
    re-register the DDL), and the bucket CONTRACT is preserved:
    cell-grain aggregates still plan zero Exchange after compaction
    (tests/test_index_store.py asserts files shrink to ≤ n_buckets,
    rows survive, serving results are unchanged). Returns before/after
    file counts."""
    final = os.path.join(root, tag)
    before = _count_parquet_files(final)
    tmp = f"{final}.compact-{os.getpid()}"
    build_tbl = f"{table}__compact_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {build_tbl}")
    prev_auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        (
            spark.table(table)
            .write.mode("overwrite")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*sort_cols)
            .option("path", tmp)
            .format("parquet")
            .saveAsTable(build_tbl)
        )
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev_auto)
    spark.sql(f"DROP TABLE {build_tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    old = f"{final}.old-{os.getpid()}"
    os.rename(final, old)
    os.rename(tmp, final)
    shutil.rmtree(old, ignore_errors=True)
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING PARQUET "
        f"CLUSTERED BY ({', '.join(bucket_cols)}) "
        f"SORTED BY ({', '.join(sort_cols)}) INTO {n_buckets} BUCKETS "
        f"LOCATION '{final}'"
    )
    return {"files_before": before, "files_after": _count_parquet_files(final)}
