"""observe-based metrics: counts must come from the single write
action, and match a direct count."""

from __future__ import annotations

import os

from hospital_data_engineering_pipeline_end_to_end_project_spark.functions.metrics import observed_write
from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_observed_write_counts(spark, tmp_path):
    e = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    path = str(tmp_path / "out")
    m = observed_write(
        e, lambda d: d.write.mode("overwrite").parquet(path), "user_id"
    )
    assert m["n_rows"] == e.count() == 1000
    assert m["n_nonnull"] == 1000
    assert os.path.exists(os.path.join(path, "_SUCCESS"))


def test_sketch_accuracy_vs_exact(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import registry

    qs = registry.queries()
    sketch = {
        r["l_returnflag"]: r for r in qs["q49_sketch_stats"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in qs["q38_distinct_counts"](spark, SF_SMOKE).collect()
    }
    for flag, ex in exact.items():
        approx = sketch[flag]["approx_parts"]
        assert abs(approx - ex["n_parts"]) / ex["n_parts"] < 0.05, (
            f"{flag}: HLL estimate {approx} vs exact {ex['n_parts']}"
        )
