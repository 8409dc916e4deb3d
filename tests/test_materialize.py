"""Index-materialization policy (operators/materialize.py).

The self-joined operators materialize their internal index by policy:
eager localCheckpoint (default, benchmark path), persist+count
(fault-tolerant: lineage retained), or lazy (caller's choice).  Every
mode must produce IDENTICAL results — the policy is purely physical.
"""

import pytest
from pyspark import StorageLevel
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe, similarity
from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.materialize import (
    EAGER,
    LAZY,
    MODES,
    PERSIST,
    materialize,
)


def test_unknown_mode_rejected(spark):
    with pytest.raises(ValueError, match="unknown materialize mode"):
        materialize(spark.range(1), "teleport")


def test_lazy_returns_input_unchanged(spark):
    df = spark.range(5)
    assert materialize(df, LAZY) is df


def test_persist_retains_lineage_and_caches(spark):
    df = materialize(spark.range(10), PERSIST)
    try:
        assert df.storageLevel == StorageLevel.MEMORY_AND_DISK
        assert df.count() == 10
    finally:
        df.unpersist()


def test_eager_truncates_lineage(spark):
    df = materialize(spark.range(10), EAGER)
    assert df.count() == 10
    assert "Scan ExistingRDD" in df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("mode", MODES)
def test_simhash_near_dups_identical_across_modes(spark, mode):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "the quick brown fox jumps over the lazy dog again"),
            (3, "completely different content about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        map(
            tuple,
            dedupe.simhash_near_dups(
                docs, "doc_id", "text", materialize_mode=mode
            ).collect(),
        )
    )
    baseline = sorted(
        map(tuple, dedupe.simhash_near_dups(docs, "doc_id", "text").collect())
    )
    assert got == baseline and got, "near-dup pair found on every mode"


@pytest.mark.parametrize("mode", MODES)
def test_lsh_topk_identical_across_modes(spark, mode):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(
        200
    )
    got = sorted(
        map(
            tuple,
            similarity.lsh_bucket_topk(
                e, k=3, materialize_mode=mode
            ).collect(),
        )
    )
    baseline = sorted(
        map(tuple, similarity.lsh_bucket_topk(e, k=3).collect())
    )
    assert got == baseline and got
