"""Structured Streaming tests: watermarked window aggregation over a
file-source stream, and the foreachBatch SCD2 sink versioning state
across micro-batches."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import scd2
from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import ingest


def _write_batch(d: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_windowed_counts_from_file_stream(spark, tmp_path):
    src = str(tmp_path / "events")
    os.makedirs(src)
    _write_batch(
        src,
        "b0.json",
        [
            {"event_id": 1, "ts": "2026-01-01T10:05:00", "user_id": 1,
             "event_type": "click", "value": 1.5},
            {"event_id": 2, "ts": "2026-01-01T10:45:00", "user_id": 2,
             "event_type": "click", "value": 2.0},
            {"event_id": 3, "ts": "2026-01-01T11:10:00", "user_id": 1,
             "event_type": "view", "value": 0.5},
        ],
    )
    stream = ingest.read_event_stream(spark, src)
    assert stream.isStreaming
    agg = ingest.windowed_event_counts(stream, "1 hour", "2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["window_start"]), r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
    finally:
        q.stop()
    assert got[("2026-01-01 10:00:00", "click")] == (2, 3.5)
    assert got[("2026-01-01 11:00:00", "view")] == (1, 0.5)


def test_stream_dedupe_within_watermark(spark, tmp_path):
    src = str(tmp_path / "dup_events")
    os.makedirs(src)
    # duplicate event_id 1 within one batch and again across batches
    _write_batch(
        src, "b0.json",
        [{"event_id": 1, "ts": "2026-01-01T10:00:00", "user_id": 1,
          "event_type": "click", "value": 1.0},
         {"event_id": 1, "ts": "2026-01-01T10:00:01", "user_id": 1,
          "event_type": "click", "value": 1.0},
         {"event_id": 2, "ts": "2026-01-01T10:01:00", "user_id": 2,
          "event_type": "view", "value": 2.0}],
    )
    _write_batch(
        src, "b1.json",
        [{"event_id": 1, "ts": "2026-01-01T10:05:00", "user_id": 1,
          "event_type": "click", "value": 1.0},
         {"event_id": 3, "ts": "2026-01-01T10:06:00", "user_id": 3,
          "event_type": "click", "value": 3.0}],
    )
    stream = ingest.read_event_stream(spark, src, max_files_per_trigger=1)
    deduped = ingest.dedupe_event_stream(stream, ["event_id"], "ts", "2 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        ids = sorted(
            r["event_id"]
            for r in spark.sql("SELECT event_id FROM dedup_stream").collect()
        )
    finally:
        q.stop()
    assert ids == [1, 2, 3], "intra- and cross-batch re-deliveries dropped"


def test_scd2_sink_versions_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    store = SilverStore(spark, wh)
    spec = scd2.Scd2Spec(keys=["user_id"])

    stream = ingest.read_event_stream(spark, src).select(
        "user_id", "event_type", "value"
    )
    dates = {0: "2026-01-01", 1: "2026-02-01"}
    sink = ingest.scd2_sink(
        stream, store, "user_state", spec,
        processing_date_fn=lambda b: dates.get(b, "2026-03-01"),
        checkpoint_dir=ckpt,
    )

    _write_batch(
        src, "b0.json",
        [{"event_id": 1, "ts": "2026-01-01T00:00:00", "user_id": 1,
          "event_type": "signup", "value": 1.0}],
    )
    q = sink.start()
    try:
        q.processAllAvailable()
        assert store.read("user_state").count() == 1

        # second micro-batch: changed attribute for user 1, new user 2
        _write_batch(
            src, "b1.json",
            [{"event_id": 2, "ts": "2026-02-01T00:00:00", "user_id": 1,
              "event_type": "purchase", "value": 9.0},
             {"event_id": 3, "ts": "2026-02-01T00:00:00", "user_id": 2,
              "event_type": "signup", "value": 1.0}],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    state = store.read("user_state")
    assert state.count() == 3, "expired v1 + current v2 for user 1, v1 for user 2"
    u1 = state.filter(F.col("user_id") == 1).collect()
    assert sorted(r["is_current"] for r in u1) == [False, True]
    cur = next(r for r in u1 if r["is_current"])
    assert cur["event_type"] == "purchase"
    v = scd2.validate(state, spec)
    assert v == {
        "multi_current_keys": 0,
        "end_before_effective": 0,
        "expired_without_end": 0,
    }


def test_stream_stream_interval_join(spark, tmp_path):
    imp_dir, clk_dir = str(tmp_path / "imps"), str(tmp_path / "clicks")
    os.makedirs(imp_dir)
    os.makedirs(clk_dir)
    _write_batch(
        imp_dir, "b0.json",
        [{"event_id": 10, "ts": "2026-01-01T10:00:00", "user_id": 1,
          "event_type": "imp", "value": 0.0},
         {"event_id": 11, "ts": "2026-01-01T10:00:00", "user_id": 2,
          "event_type": "imp", "value": 0.0}],
    )
    _write_batch(
        clk_dir, "b0.json",
        [  # in-window click (3 min after user 1's impression)
         {"event_id": 20, "ts": "2026-01-01T10:03:00", "user_id": 1,
          "event_type": "click", "value": 1.0},
           # out-of-window click (user 2, 40 min later)
         {"event_id": 21, "ts": "2026-01-01T10:40:00", "user_id": 2,
          "event_type": "click", "value": 1.0},
           # click BEFORE any impression — must not match
         {"event_id": 22, "ts": "2026-01-01T09:59:00", "user_id": 1,
          "event_type": "click", "value": 1.0}],
    )
    imps = ingest.read_event_stream(spark, imp_dir)
    clicks = ingest.read_event_stream(spark, clk_dir)
    joined = ingest.interval_join_streams(imps, clicks, max_delay="10 minutes")
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM attrib").collect()
    finally:
        q.stop()
    got = {(r["left_id"], r["right_id"], r["delay_s"]) for r in rows}
    assert got == {(10, 20, 180)}

    # identical semantics on batch inputs (the stated contract)
    import pyspark.sql.types as T
    mk = lambda rows: spark.createDataFrame(
        [(i, ts, u) for i, ts, u in rows],
        T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]),
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b = ingest.interval_join_streams(
        mk([(10, "2026-01-01 10:00:00", 1), (11, "2026-01-01 10:00:00", 2)]),
        mk([(20, "2026-01-01 10:03:00", 1), (21, "2026-01-01 10:40:00", 2),
            (22, "2026-01-01 09:59:00", 1)]),
        max_delay="10 minutes",
    )
    assert {(r["left_id"], r["right_id"]) for r in b.collect()} == {(10, 20)}


def test_streaming_session_windows_merge_and_close(spark, tmp_path):
    src = str(tmp_path / "sess_events")
    os.makedirs(src)
    # user 1: two events 10 min apart (one session), then a 2-hour jump
    # (new session); the late final event advances the watermark so the
    # earlier sessions close and append-mode emits them
    _write_batch(
        src, "b0.json",
        [{"event_id": 1, "ts": "2026-01-01T10:00:00", "user_id": 1,
          "event_type": "click", "value": 1.0},
         {"event_id": 2, "ts": "2026-01-01T10:10:00", "user_id": 1,
          "event_type": "click", "value": 1.0},
         {"event_id": 3, "ts": "2026-01-01T12:30:00", "user_id": 1,
          "event_type": "view", "value": 1.0}],
    )
    _write_batch(
        src, "b1.json",
        [{"event_id": 4, "ts": "2026-01-01T18:00:00", "user_id": 2,
          "event_type": "click", "value": 1.0}],
    )
    stream = ingest.read_event_stream(spark, src, max_files_per_trigger=1)
    sessions = ingest.session_event_counts(stream, gap="30 minutes",
                                           watermark="1 hour")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sessions").collect()
    finally:
        q.stop()
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"])
        for r in rows
    }
    # both user-1 sessions closed once the watermark passed; the
    # merged first session spans 10:00 -> 10:10+gap
    assert (1, "2026-01-01 10:00:00", "2026-01-01 10:40:00", 2) in got
    assert (1, "2026-01-01 12:30:00", "2026-01-01 13:00:00", 1) in got


def test_stream_static_dim_enrichment(spark, tmp_path):
    src = str(tmp_path / "enrich_events")
    os.makedirs(src)
    _write_batch(
        src,
        "b0.json",
        [
            {"event_id": 1, "ts": "2026-01-01T10:00:00", "user_id": 1,
             "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2026-01-01T10:01:00", "user_id": 2,
             "event_type": "view", "value": 2.0},
            {"event_id": 3, "ts": "2026-01-01T10:02:00", "user_id": 9,
             "event_type": "click", "value": 3.0},
        ],
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    stream = ingest.read_event_stream(spark, src)
    enriched = ingest.enrich_with_dim(stream, dim, "user_id")
    assert enriched.isStreaming
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_events")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["event_id"]: r["tier"]
            for r in spark.sql("SELECT * FROM enriched_events").collect()
        }
    finally:
        q.stop()
    assert got == {1: "gold", 2: "silver", 3: None}, (
        "left join keeps events whose user has no dim row"
    )


def test_scd2_batch_merger_replay_is_skipped(spark, tmp_path):
    # foreachBatch is at-least-once: a replayed batch id must be a
    # no-op EVEN when the processing-date function is wall-clock-like
    # (returns a different date per call) — the applied-batch ledger
    # catches what merge idempotency alone cannot
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import scd2
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import ingest

    store = SilverStore(spark, str(tmp_path / "store"))
    spec = scd2.Scd2Spec(keys=["user_id"])
    dates = iter(["2026-01-01", "2026-02-01", "2026-03-01"])
    merger = ingest.make_scd2_batch_merger(
        store, "users", spec, processing_date_fn=lambda b: next(dates)
    )
    batch = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "user_id long, plan string"
    )
    merger(batch, 0)
    assert store.read("users").count() == 2
    # replay of batch 0: skipped by ledger, wall-clock date unused
    merger(batch, 0)
    state = store.read("users").collect()
    assert len(state) == 2 and all(r["is_current"] for r in state)
    # a genuinely new batch still merges (and versions a change)
    merger(
        spark.createDataFrame([(1, "gamma")], "user_id long, plan string"),
        1,
    )
    assert store.read("users").count() == 3


def test_scd2_batch_merger_opt_out_keeps_old_behavior(spark, tmp_path):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import scd2
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import ingest

    store = SilverStore(spark, str(tmp_path / "store"))
    spec = scd2.Scd2Spec(keys=["user_id"])
    merger = ingest.make_scd2_batch_merger(
        store, "users", spec, skip_applied=False
    )
    batch = spark.createDataFrame([(1, "alpha")], "user_id long, plan string")
    merger(batch, 0)
    merger(batch, 0)  # deterministic default date: idempotent merge
    state = store.read("users").collect()
    assert len(state) == 1 and state[0]["is_current"]


def test_scd2_batch_merger_crash_between_commit_and_marker(spark, tmp_path):
    """The r08 residual risk, now closed: a crash AFTER the state
    commit but BEFORE the marker write re-delivers the batch, and a
    wall-clock date function would have double-versioned it.  The
    commit carries the batch id in the same atomic rename, so replay
    detects the state's own epoch, restores the marker, and skips."""
    import os

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import scd2
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import ingest

    store = SilverStore(spark, str(tmp_path / "store"))
    spec = scd2.Scd2Spec(keys=["user_id"])
    dates = iter(["2026-01-01", "2026-02-01", "2026-03-01"])
    merger = ingest.make_scd2_batch_merger(
        store, "users", spec, processing_date_fn=lambda b: next(dates)
    )
    batch = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "user_id long, plan string"
    )
    merger(batch, 0)
    marker = os.path.join(
        str(tmp_path / "store"), "silver", "users__applied", "batch-0"
    )
    assert os.path.exists(marker)
    assert store.last_applied("users") == 0

    # simulate the crash window: commit survived, marker did not
    os.remove(marker)
    merger(batch, 0)  # replay — wall-clock date fn would differ
    state = store.read("users").collect()
    assert len(state) == 2 and all(r["is_current"] for r in state), (
        "replay after crash must not double-version"
    )
    assert os.path.exists(marker), "replay must restore the marker"

    # and the pipeline still moves on to genuinely new batches
    merger(
        spark.createDataFrame([(1, "gamma")], "user_id long, plan string"),
        1,
    )
    assert store.read("users").count() == 3
    assert store.last_applied("users") == 1


def test_novelty_ingest_gates_across_batches(spark, tmp_path):
    """Streaming corpus ingestion: batch 0 admits everything novel,
    batch 1's near-duplicate of an ALREADY-ADMITTED doc is rejected
    by the stored fingerprint index while its genuinely new doc is
    admitted; replay (marker lost after commit) is a no-op."""
    import os

    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest

    store = SilverStore(spark, str(tmp_path / "corpus"))
    ingest = corpus_ingest.make_novelty_batch_ingestor(store)

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun"
    )
    near = base.replace("afternoon", "evening")
    other = (
        "completely different text about spark shuffles partitions and "
        "broadcast joins running on large clusters with many executors"
    )
    third = (
        "yet another unrelated document describing medallion layers "
        "bronze silver gold and the merge semantics between them all"
    )
    b0 = spark.createDataFrame(
        [(1, base), (2, other), (3, base)], "doc_id long, text string"
    )
    ingest(b0, 0)
    # doc 3 is an identical twin of doc 1 INSIDE the batch: the
    # intra-batch guard keeps the lowest id only
    acc0 = spark.read.parquet(
        corpus_ingest.accepted_batch_path(store.root, 0)
    )
    assert sorted(r["doc_id"] for r in acc0.collect()) == [1, 2]
    assert corpus_ingest.read_index(spark, store.root).count() == 2

    b1 = spark.createDataFrame(
        [(10, near), (11, third)], "doc_id long, text string"
    )
    ingest(b1, 1)
    acc1 = spark.read.parquet(
        corpus_ingest.accepted_batch_path(store.root, 1)
    )
    # the near-dup of admitted doc 1 is rejected by the INDEX (its
    # text was never re-read); the new doc is admitted
    assert [r["doc_id"] for r in acc1.collect()] == [11]
    idx = corpus_ingest.read_index(spark, store.root)
    assert sorted(r["doc_id"] for r in idx.collect()) == [1, 2, 11]
    # the shard IS the epoch: batch 1's shard committed with _SUCCESS
    assert os.path.exists(os.path.join(
        corpus_ingest.index_shard_path(store.root, 1), "_SUCCESS"
    ))

    # crash window: marker lost after the shard commit -> replay must
    # not re-append fingerprints or duplicate accepted output
    marker = os.path.join(
        store.root, "silver",
        f"{corpus_ingest.INDEX_DIR}__applied", "batch-1",
    )
    os.remove(marker)
    ingest(b1, 1)
    assert corpus_ingest.read_index(spark, store.root).count() == 3
    assert os.path.exists(marker)


def test_novelty_ingest_streaming_end_to_end(spark, tmp_path):
    """The same gate driven by a real file-backed micro-batch stream
    (foreachBatch, availableNow): accepted output across all batches
    equals the batch-mode expectation."""
    import glob
    import os

    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun"
    )
    other = (
        "completely different text about spark shuffles partitions and "
        "broadcast joins running on large clusters with many executors"
    )
    third = (
        "yet another unrelated document describing medallion layers "
        "bronze silver gold and the merge semantics between them all"
    )
    fresh = (
        "a genuinely new document arriving later about watermarks "
        "state stores and exactly once semantics in streaming engines"
    )
    import json as _json

    with open(os.path.join(src, "a.json"), "w") as fh:
        for i, t in [(0, base), (1, other), (2, third)]:
            fh.write(_json.dumps({"doc_id": i, "text": t}) + "\n")
    with open(os.path.join(src, "b.json"), "w") as fh:
        # 100 is a one-token edit of the ALREADY-streamed doc 0;
        # 101 is genuinely new
        for i, t in [
            (100, base.replace("afternoon", "evening")),
            (101, fresh),
        ]:
            fh.write(_json.dumps({"doc_id": i, "text": t}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    store = SilverStore(spark, str(tmp_path / "corpus"))
    q = corpus_ingest.novelty_ingest_sink(
        stream,
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    accepted = spark.read.parquet(
        os.path.join(store.root, "accepted")
    )
    got = sorted(r["doc_id"] for r in accepted.collect())
    # file order within a listing batch is deterministic (a.json
    # before b.json at one file per trigger): the 3 originals and the
    # genuinely-new doc are admitted, the near-dup of doc 0 is
    # rejected by the stored index
    assert got == [0, 1, 2, 101], got
    assert corpus_ingest.read_index(spark, store.root).count() == 4


def test_novelty_ingest_string_ids(spark, tmp_path):
    """The empty-index bootstrap derives the id type from the batch —
    string-keyed corpora ingest identically."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest

    store = SilverStore(spark, str(tmp_path / "corpus"))
    ingest = corpus_ingest.make_novelty_batch_ingestor(store)
    b = spark.createDataFrame(
        [("u-1", "some document text with several words inside it here"),
         ("u-2", "a different document about entirely other topics now")],
        "doc_id string, text string",
    )
    ingest(b, 0)
    idx = corpus_ingest.read_index(spark, store.root)
    assert idx.schema["doc_id"].dataType.simpleString() == "string"
    assert sorted(r["doc_id"] for r in idx.collect()) == ["u-1", "u-2"]


def test_novelty_ingest_partial_shard_replay_recovers(spark, tmp_path):
    """Crash DURING the fingerprint-shard write (task files renamed
    into the shard dir, no _SUCCESS, no marker): the replay must not
    see the batch's own partial fingerprints — docs would test
    non-novel against themselves and be silently lost.  The replay
    purges the partial shard, recomputes, and admits everything the
    clean run would."""
    import os
    import shutil

    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest

    store = SilverStore(spark, str(tmp_path / "corpus"))
    ingest = corpus_ingest.make_novelty_batch_ingestor(store)
    texts = [
        (1, "the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill in the afternoon sun"),
        (2, "completely different text about spark shuffles partitions "
            "and broadcast joins running on large clusters with executors"),
    ]
    b0 = spark.createDataFrame(texts, "doc_id long, text string")
    ingest(b0, 0)

    # simulate the crash window: shard data committed by tasks but the
    # job-level _SUCCESS and the marker never landed
    shard = corpus_ingest.index_shard_path(store.root, 0)
    os.remove(os.path.join(shard, "_SUCCESS"))
    marker = os.path.join(
        store.root, "silver",
        f"{corpus_ingest.INDEX_DIR}__applied", "batch-0",
    )
    os.remove(marker)
    shutil.rmtree(corpus_ingest.accepted_batch_path(store.root, 0))

    ingest(b0, 0)  # replay
    acc = spark.read.parquet(corpus_ingest.accepted_batch_path(store.root, 0))
    assert sorted(r["doc_id"] for r in acc.collect()) == [1, 2]
    idx = corpus_ingest.read_index(spark, store.root)
    assert sorted(r["doc_id"] for r in idx.collect()) == [1, 2]
    assert os.path.exists(marker)


def test_novelty_index_compaction_preserves_membership(spark, tmp_path):
    """compact_every merges batch shards into one compact_upto=N dir:
    (id, simhash) membership is identical before/after, shard-dir
    count drops to 1, and the gate still rejects near-dups of docs
    admitted BEFORE the compaction."""
    import os

    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest

    store = SilverStore(spark, str(tmp_path / "corpus"))
    ingest = corpus_ingest.make_novelty_batch_ingestor(
        store, compact_every=3
    )
    texts = {
        0: "the quick brown fox jumps over the lazy dog while the cat "
           "watches from the warm windowsill in the afternoon sun",
        1: "completely different text about spark shuffles partitions "
           "and broadcast joins running on large clusters with executors",
        2: "yet another unrelated document describing medallion layers "
           "bronze silver gold and the merge semantics between them all",
    }
    for b, t in texts.items():
        ingest(
            spark.createDataFrame([(b, t)], "doc_id long, text string"), b
        )
    # batch 2 crossed the threshold: the index is now one compacted dir
    dirs = os.listdir(os.path.join(store.root, corpus_ingest.INDEX_DIR))
    assert dirs == ["compact_upto=2"], dirs
    idx = corpus_ingest.read_index(spark, store.root)
    assert sorted(r["doc_id"] for r in idx.collect()) == [0, 1, 2]

    # a near-dup of the FIRST admitted doc must still be rejected by
    # the compacted index; a fresh doc is admitted
    b3 = spark.createDataFrame(
        [(30, texts[0].replace("afternoon", "evening")),
         (31, "a genuinely new document about watermarks state stores "
              "and exactly once semantics in streaming engines today")],
        "doc_id long, text string",
    )
    ingest(b3, 3)
    acc = spark.read.parquet(corpus_ingest.accepted_batch_path(store.root, 3))
    assert [r["doc_id"] for r in acc.collect()] == [31]


def test_compact_index_interrupted_cleanup_is_finished(spark, tmp_path):
    """Crash mid-cleanup leaves a committed compact dir PLUS subsumed
    batch shards: readers see duplicate fingerprints (harmless to the
    membership test) and the next compact_index call finishes the
    delete without rewriting anything."""
    import os

    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest

    store = SilverStore(spark, str(tmp_path / "corpus"))
    ingest = corpus_ingest.make_novelty_batch_ingestor(
        store, compact_every=None
    )
    for b, t in enumerate([
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun",
        "completely different text about spark shuffles partitions "
        "and broadcast joins running on large clusters with executors",
    ]):
        ingest(spark.createDataFrame([(b, t)], "doc_id long, text string"), b)

    # compact, then resurrect a subsumed shard (= crash mid-delete)
    idx_root = os.path.join(store.root, corpus_ingest.INDEX_DIR)
    shard0 = corpus_ingest.index_shard_path(store.root, 0)
    import shutil

    saved = str(tmp_path / "saved_shard0")
    shutil.copytree(shard0, saved)
    corpus_ingest.compact_index(spark, store.root)
    assert sorted(os.listdir(idx_root)) == ["compact_upto=1"]
    shutil.copytree(saved, shard0)

    # duplicates are harmless: membership (set) is unchanged
    idx = corpus_ingest.read_index(spark, store.root)
    assert sorted({r["doc_id"] for r in idx.collect()}) == [0, 1]
    # and the next compaction finishes the cleanup without a rewrite
    stats = corpus_ingest.compact_index(spark, store.root)
    assert stats["dirs_after"] == 1
    assert sorted(os.listdir(idx_root)) == ["compact_upto=1"]


def test_novelty_replay_after_compaction_keeps_accepted_docs(spark, tmp_path):
    """The replay-vs-compaction hole (round-10 advice): once
    compact_index has folded batch N's fingerprint shard into
    compact_upto=M, a replayed batch N (marker ledger lost, or
    skip_applied=False) must NOT test its docs against their own
    fingerprints inside the merged dir — that would mark everything
    non-novel and overwrite accepted/batch=N with an empty frame.
    Self-exclusion now rides the batch_id COLUMN, which compaction
    preserves, so the replay recomputes the original verdicts."""
    import os

    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest

    store = SilverStore(spark, str(tmp_path / "corpus"))
    # skip_applied=False: every call recomputes (the harsher replay
    # mode the advice names); compaction runs past 2 shards
    ingest = corpus_ingest.make_novelty_batch_ingestor(
        store, skip_applied=False, compact_every=2
    )
    texts = {
        0: "the quick brown fox jumps over the lazy dog while the cat "
           "watches from the warm windowsill in the afternoon sun",
        1: "completely different text about spark shuffles partitions "
           "and broadcast joins running on large clusters with executors",
    }
    for b, t in texts.items():
        ingest(
            spark.createDataFrame([(b, t)], "doc_id long, text string"), b
        )
    # both batch shards are folded away
    idx_root = os.path.join(store.root, corpus_ingest.INDEX_DIR)
    assert sorted(os.listdir(idx_root)) == ["compact_upto=1"]

    # replay batch 0: its fingerprints live ONLY inside the compacted
    # dir now; the column-level self-exclusion must keep doc 0 novel
    ingest(
        spark.createDataFrame([(0, texts[0])], "doc_id long, text string"), 0
    )
    acc0 = spark.read.parquet(corpus_ingest.accepted_batch_path(store.root, 0))
    assert [r["doc_id"] for r in acc0.collect()] == [0]
    # membership unchanged: the replayed shard (batch_id=0 <= M) is
    # ignored by the subsumption rule, the compacted rows still serve
    idx = corpus_ingest.read_index(spark, store.root)
    assert sorted({r["doc_id"] for r in idx.collect()}) == [0, 1]

    # and the gate still rejects a near-dup of the replayed doc
    ingest(
        spark.createDataFrame(
            [(30, texts[0].replace("afternoon", "evening")),
             (31, "a genuinely new document about watermarks state "
                  "stores and exactly once semantics in streams")],
            "doc_id long, text string",
        ),
        2,
    )
    acc2 = spark.read.parquet(corpus_ingest.accepted_batch_path(store.root, 2))
    assert [r["doc_id"] for r in acc2.collect()] == [31]


def test_novelty_index_ignores_stray_temp_dirs(spark, tmp_path):
    """A leftover dir with an unparseable suffix under the index root
    (a crashed rename, a manual copy) must be skipped, not raise
    ValueError and brick every read and ingest on the store."""
    import os

    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest

    store = SilverStore(spark, str(tmp_path / "corpus"))
    ingest = corpus_ingest.make_novelty_batch_ingestor(store)
    ingest(
        spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog while the "
                 "cat watches from the warm windowsill in the sun")],
            "doc_id long, text string",
        ),
        0,
    )
    os.makedirs(
        os.path.join(store.root, corpus_ingest.INDEX_DIR, "batch_id=tmp-999")
    )
    assert corpus_ingest.read_index(spark, store.root).count() == 1
    # ingest keeps working too
    ingest(
        spark.createDataFrame(
            [(2, "completely different text about spark shuffles and "
                 "broadcast joins running on large clusters today")],
            "doc_id long, text string",
        ),
        1,
    )
    assert corpus_ingest.read_index(spark, store.root).count() == 2


def test_read_index_null_safe_exclusion_keeps_legacy_shards(spark, tmp_path):
    """A store upgraded mid-stream holds PRE-batch_id-column shards
    next to stamped ones.  read_index's replay self-exclusion filters
    on the batch_id COLUMN — a plain `!=` evaluates to NULL on the
    legacy rows and would silently drop the entire pre-upgrade corpus
    from the index view on every ingest, blinding the novelty gate.
    The exclusion must be null-safe."""
    import os

    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest

    root = str(tmp_path / "corpus")
    # a compacted upgraded store: the merged dir holds pre-upgrade
    # rows (NULL batch_id) next to stamped ones — dir-level skipping
    # can't apply here, so the COLUMN filter is the only guard
    spark.createDataFrame(
        [(1, 1111, None), (2, 2222, None), (10, 3333, 5)],
        "doc_id long, simhash long, batch_id long",
    ).write.parquet(
        os.path.join(root, corpus_ingest.INDEX_DIR, "compact_upto=5")
    )
    # plus a raw legacy batch shard with NO batch_id column at all —
    # the mergeSchema read must surface it as null, not drop/miss it
    spark.createDataFrame(
        [(3, 4444)], "doc_id long, simhash long"
    ).write.parquet(corpus_ingest.index_shard_path(root, 6))

    # replaying batch 5 post-compaction: its own fingerprints must be
    # excluded, every legacy fingerprint must SURVIVE the exclusion
    idx = corpus_ingest.read_index(spark, root, exclude_batch=5)
    assert sorted(r["doc_id"] for r in idx.collect()) == [1, 2, 3]
    # no exclusion: everything is visible
    assert corpus_ingest.read_index(spark, root).count() == 4
