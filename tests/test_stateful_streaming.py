"""applyInPandasWithState: keyed state must accumulate across
micro-batches and only touched keys re-emit."""

from __future__ import annotations

import json
import os

from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import ingest, stateful


def _write(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stateful_totals_accumulate(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(src, "b0.json", [
        {"event_id": 1, "ts": "2026-01-01T00:00:00", "user_id": 1,
         "event_type": "click", "value": 2.0},
        {"event_id": 2, "ts": "2026-01-01T00:01:00", "user_id": 1,
         "event_type": "click", "value": 3.0},
        {"event_id": 3, "ts": "2026-01-01T00:02:00", "user_id": 2,
         "event_type": "view", "value": 1.0},
    ])
    out = stateful.running_user_totals(ingest.read_event_stream(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM totals").collect()
        }
        assert got1 == {1: (2, 5.0), 2: (1, 1.0)}

        # second micro-batch touches only user 1: state must carry over
        _write(src, "b1.json", [
            {"event_id": 4, "ts": "2026-01-01T01:00:00", "user_id": 1,
             "event_type": "click", "value": 10.0},
        ])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM totals").collect()
    finally:
        q.stop()

    latest = {}
    for r in rows:  # memory sink in update mode appends; last write wins
        latest[r["user_id"]] = (r["n_events"], r["total_value"])
    assert latest[1] == (3, 15.0), "state accumulated across micro-batches"
    assert latest[2] == (1, 1.0)
