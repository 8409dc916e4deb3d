"""Committed-shard store: the shared lifecycle machinery behind every
per-batch streaming sink (novelty index, monitor sinks, IVF postings).

All four streaming sinks in this engine share one layout: each
micro-batch writes its own deterministic ``batch=N`` (or
``batch_id=N``) parquet directory, so replay overwrites rather than
duplicates, and readers union the accumulated shards.  That layout has
three lifecycle obligations this module centralizes:

- **Committed-only reads.**  A crash mid-shard-write leaves a partial
  directory with task files but no ``_SUCCESS``; unioning it corrupts
  or fails the read.  Every listing here filters to dirs containing
  Spark's ``_SUCCESS`` marker, and ignores entries whose numeric
  suffix does not parse (a leftover temp/renamed dir must degrade to
  "skipped", never to a raised ``ValueError`` that bricks the store).

- **Compaction.**  Shard count grows linearly over the stream's
  lifetime and the probe's list+open cost with it (measured in
  BASELINE.md: 0.093 s -> 0.27 s by 60 shards on a *local* fs; object
  stores are far worse).  :func:`compact_shards` folds every active
  shard into one ``compact_upto=N`` dir — committed through Spark's
  own ``_SUCCESS`` *before* any source is deleted, so the store is
  readable at every instant — and sizes the output by bytes rather
  than forcing one file (a ``coalesce(1)`` rewrite would be a single
  task over an ever-growing file, collapsing read parallelism as the
  store grows).  Sinks whose shards are mergeable summaries pass a
  ``fold`` (bottom-k re-rank, counter summation, CUSUM segment
  composition) so the compacted dir shrinks to summary size.

- **Subsumption reads.**  Once ``compact_upto=M`` is committed, every
  batch shard ``<= M`` is redundant; readers take the newest compacted
  dir plus only the batch shards ``> M``.  This makes reads EXACT (not
  merely duplicate-tolerant) in every crash window: uncommitted merge
  -> old shards still served; crash mid-cleanup -> leftovers are
  excluded by the rule rather than double-counted; a batch replayed
  *after* its shard was compacted away lands a ``batch=N <= M`` dir
  that the rule ignores.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

#: recognized shard-dir prefixes: per-batch shards under either naming
#: convention, and the compacted-merge dir
BATCH_PREFIXES = ("batch=", "batch_id=")
COMPACT_PREFIX = "compact_upto="

#: compaction output sizing — small relative to the table default
#: because shard stores hold fingerprints/summaries, not fact rows
DEFAULT_TARGET_BYTES = 64 * 1024 * 1024


def committed_shard_dirs(root: str) -> list[tuple[str, int, str]]:
    """``(kind, n, path)`` for every COMMITTED shard dir under root —
    kind ``"batch"`` (``batch=n`` / ``batch_id=n``) or ``"compact"``
    (``compact_upto=n``).  Commit = Spark's ``_SUCCESS``, so partial
    writes are invisible; unparseable suffixes (a stray temp dir) are
    skipped, not raised."""
    out: list[tuple[str, int, str]] = []
    if not os.path.isdir(root):
        return out
    for e in sorted(os.listdir(root)):
        kind = None
        if e.startswith(COMPACT_PREFIX):
            kind = "compact"
        else:
            for p in BATCH_PREFIXES:
                if e.startswith(p):
                    kind = "batch"
                    break
        if kind is None:
            continue
        try:
            n = int(e.split("=", 1)[1])
        except ValueError:
            continue
        path = os.path.join(root, e)
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            out.append((kind, n, path))
    return out


def active_shard_dirs(root: str) -> list[tuple[str, int, str]]:
    """The dirs a reader should union: the newest committed
    ``compact_upto=M`` (if any) plus batch shards strictly ``> M`` —
    the subsumption rule that keeps reads exact through every
    compaction crash window and through post-compaction replays."""
    shards = committed_shard_dirs(root)
    ms = [n for kind, n, _ in shards if kind == "compact"]
    if not ms:
        return shards
    m = max(ms)
    return [
        (kind, n, path)
        for kind, n, path in shards
        if (kind == "compact" and n == m) or (kind == "batch" and n > m)
    ]


def read_shards(spark: SparkSession, root: str) -> DataFrame | None:
    """Union of the active committed shards (explicit paths — never a
    glob that could pick up a partially-written dir); ``None`` when no
    committed shard exists yet."""
    paths = [p for _, _, p in active_shard_dirs(root)]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def cleanup_subsumed(root: str) -> None:
    """Finish an interrupted compaction: once ``compact_upto=M`` is
    committed, every batch shard ``<= M`` and every older compacted
    dir is redundant — delete them (idempotent)."""
    shards = committed_shard_dirs(root)
    ms = [n for kind, n, _ in shards if kind == "compact"]
    if not ms:
        return
    m = max(ms)
    for kind, n, path in shards:
        if (kind == "batch" and n <= m) or (kind == "compact" and n < m):
            shutil.rmtree(path, ignore_errors=True)


def _dir_bytes(paths: list[str]) -> int:
    total = 0
    for p in paths:
        for r, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(r, f))
    return total


def write_shard(df: DataFrame, dest: str) -> None:
    """Write one batch shard with AQE-sized output files: a REBALANCE
    hint before the write lets AQE coalesce the shard to
    ``advisoryPartitionSizeInBytes``-sized files instead of one file
    per upstream compute task — a compute-parallel batch (the writers
    all fan the decode/hash stage across every core) otherwise writes
    cores-many KB-sized files, and every later list+open of the store
    pays for them (guide §6's small-files tax; object stores far more
    than local fs).  The extra exchange moves only the post-compute
    shard rows, and at real batch sizes AQE re-expands the partition
    count to match the data, so write parallelism is not capped."""
    df.hint("rebalance").write.mode("overwrite").parquet(dest)


def build_shards_concurrently(writer, batches) -> None:
    """Run independent per-batch shard writes as CONCURRENT Spark jobs
    from driver threads — ``batches`` is ``[(batch_id, DataFrame),
    ...]`` and ``writer`` a ``foreachBatch``-shaped handler.

    The per-shard commit contract is untouched: each thread submits
    its own job writing its own ``batch=N`` dir with its own
    ``_SUCCESS``, so crash semantics, replay idempotency and the
    subsumption rule are exactly the sequential loop's.  What changes
    is wall-clock: a historical backfill of K small batches no longer
    pays K × (job scheduling + scan + underfilled stages) serially —
    Spark's scheduler interleaves the jobs across the executor pool
    (the same thing K genuinely-concurrent micro-batches would do on
    a cluster).  Live streaming ingest keeps the sequential
    ``foreachBatch`` path: micro-batches ARRIVE one at a time there,
    so there is nothing to overlap.  Exceptions from any job
    propagate (the build must not half-succeed silently)."""
    from concurrent.futures import ThreadPoolExecutor

    if not batches:
        return
    with ThreadPoolExecutor(max_workers=len(batches)) as ex:
        futs = [ex.submit(writer, df, bid) for bid, df in batches]
        for f in futs:
            f.result()


def compact_shards(
    spark: SparkSession,
    root: str,
    fold=None,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict[str, int]:
    """Merge the active shards into one ``compact_upto=N`` dir
    (N = highest batch/compact id present) and delete the subsumed
    sources.

    ``fold`` (optional, ``DataFrame -> DataFrame``) lets summary-sink
    shards collapse to their mergeable form — it must be value-neutral
    through the sink's read path (bottom-k re-rank, counter summation,
    CUSUM segment composition; each is pinned bit-identical by
    ``tests/test_stream_monitor.py`` / ``test_stream_ann_index.py``).
    Without it the merge is the plain union of exactly the dirs it
    replaces.

    Output is sized by input bytes (``ceil(bytes / target)`` files),
    never ``coalesce(1)`` — a single ever-growing file would serialize
    both the rewrite and every later read.  The merge commits through
    ``_SUCCESS`` before any source is deleted, so the store is
    readable at every instant; a crash mid-cleanup is finished by the
    next call (or by :func:`cleanup_subsumed`).
    """
    active = active_shard_dirs(root)
    n_before = len(committed_shard_dirs(root))
    if not active or (len(active) == 1 and active[0][0] == "compact"):
        # nothing new to fold — just finish any interrupted cleanup
        cleanup_subsumed(root)
        return {
            "dirs_before": n_before,
            "dirs_after": len(committed_shard_dirs(root)),
        }
    n = max(nn for _, nn, _ in active)
    paths = [p for _, _, p in active]
    merged = spark.read.parquet(*paths)
    if fold is not None:
        merged = fold(merged)
    n_files = max(1, math.ceil(_dir_bytes(paths) / target_file_bytes))
    dest = os.path.join(root, f"{COMPACT_PREFIX}{n}")
    # dest is always a NEW id: with a prior compact_upto=M active, the
    # subsumption rule only admits batch shards > M, so n > M here.
    # Overwrite clobbers a half-written dest from a crashed prior run;
    # _SUCCESS lands before any source is deleted.
    merged.repartition(n_files).write.mode("overwrite").parquet(dest)
    cleanup_subsumed(root)
    return {
        "dirs_before": n_before,
        "dirs_after": len(committed_shard_dirs(root)),
    }
