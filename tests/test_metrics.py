"""observe-based metrics: counts must come from the single write
action, and match a direct count."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

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
        # md5-KMV, k=256: at smoke scale distinct-per-group < k, so the
        # sketch degenerates to the exact count by construction; the
        # estimator branch is exercised separately below
        assert abs(approx - ex["n_parts"]) / ex["n_parts"] < 0.05, (
            f"{flag}: KMV estimate {approx} vs exact {ex['n_parts']}"
        )


def test_kmv_estimator_branch(spark):
    """Force the (k-1)/h_k estimator with a small k and check it lands
    within a few relative std errors (rse ~= 1/sqrt(k-2))."""
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions.metrics import kmv_distinct
    from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table

    l = load_table(spark, SF_SMOKE, "lineitem")
    exact = l.select("l_partkey").distinct().count()
    k = 64
    est = kmv_distinct(
        l.withColumn("g", F.lit(1)), ["g"], "l_partkey", k=k
    ).collect()[0]["approx_distinct"]
    rse = 1.0 / (k - 2) ** 0.5
    assert exact > k, "fixture must exercise the estimator branch"
    assert abs(est - exact) / exact < 5 * rse, f"KMV {est} vs exact {exact}"


def test_kmv_sketches_merge_exactly(spark):
    # the mergeability identity: re-ranking the union of per-part
    # bottom-k sketches gives BIT-IDENTICAL estimates to sketching the
    # combined data directly — and the estimate lands near truth
    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import metrics

    import random as _r

    rng = _r.Random(13)
    rows = [(f"p{i % 4}", f"v{rng.randrange(5000)}") for i in range(20000)]
    d = spark.createDataFrame(rows, "part string, v string")
    k = 64
    sk = metrics.kmv_bottom_k(d, ["part"], "v", k=k)
    merged = metrics.kmv_estimate(sk, [], k=k).collect()[0]["approx_distinct"]
    direct = metrics.kmv_estimate(
        metrics.kmv_bottom_k(d, [], "v", k=k), [], k=k
    ).collect()[0]["approx_distinct"]
    assert merged == direct, "merge must equal the direct sketch exactly"
    truth = d.select("v").distinct().count()
    assert abs(merged - truth) / truth < 0.35, (
        f"KMV estimate {merged} too far from truth {truth}"
    )


def test_two_level_kmv_bit_identical_to_one_level(spark):
    """The r09 two-level construction (bottom-k per (group, salt) then
    a bounded merge re-rank) must reproduce the one-level rank
    BIT-exactly — the subset identity that keeps the q49/q103 oracle
    hashes valid — and its full-stream window must be salted (no
    single task ever sorts a group's whole distinct set)."""
    import random as _r

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import metrics

    rng = _r.Random(29)
    rows = [(f"g{i % 3}", f"v{rng.randrange(3000)}") for i in range(12000)]
    d = spark.createDataFrame(rows, "g string, v string")
    k = 32

    def one_level(df, group_cols):
        dh = df.select(*group_cols, "v").distinct().withColumn(
            "h", metrics.hash_fraction("v")
        )
        w = Window.partitionBy(*group_cols).orderBy("h")
        return (
            dh.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(*group_cols, "h")
        )

    for group_cols in (["g"], []):
        got = sorted(map(tuple, metrics.kmv_bottom_k(d, group_cols, "v", k=k).collect()))
        ref = sorted(map(tuple, one_level(d, group_cols).collect()))
        assert got == ref, f"two-level != one-level for groups={group_cols}"

    # estimates compose through the same identity
    got_est = sorted(
        map(tuple, metrics.kmv_distinct(d, ["g"], "v", k=k).collect())
    )
    ref_est = sorted(
        map(
            tuple,
            metrics.kmv_estimate(one_level(d, ["g"]), ["g"], k=k).collect(),
        )
    )
    assert got_est == ref_est

    # plan contract: the window over the raw distinct stream partitions
    # by the salt; only the bounded merge re-rank may run unsalted
    sk = metrics.kmv_bottom_k(d, [], "v", k=k)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, "full-stream window must be salt-partitioned"
    first_window = plan[plan.rindex("Window") :]  # innermost = raw stream
    assert "__salt" in first_window.split("\n")[0]


def test_kmv_pair_overlap_exact_below_k(spark):
    """Sketch-only pairwise overlap: when both groups hold fewer than
    k distinct values the sketches ARE the sets, so union /
    intersection / Jaccard estimates are exact; the estimator path is
    sanity-checked against truth at small k."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import metrics

    rows = (
        [("A", f"v{i}") for i in range(60)]
        + [("B", f"v{i}") for i in range(40, 120)]
        + [("C", f"w{i}") for i in range(30)]
    )
    d = spark.createDataFrame(rows, "g string, v string")
    sk = metrics.kmv_bottom_k(d, ["g"], "v", k=128)
    got = {
        (r["group_a"], r["group_b"]): r
        for r in metrics.kmv_pair_overlap(sk, "g", k=128).collect()
    }
    ab = got[("A", "B")]
    assert (ab["est_a"], ab["est_b"], ab["est_union"], ab["est_inter"]) == (
        60, 80, 120, 20,
    )
    assert ab["jaccard_est"] == round(20 / 120, 6)
    assert got[("A", "C")]["est_inter"] == 0
    assert got[("B", "C")]["jaccard_est"] == 0.0

    # estimator branch: big overlapping sets at small k land near truth
    import random as _r

    rng = _r.Random(7)
    big = (
        [("X", f"t{i}") for i in range(3000)]
        + [("Y", f"t{i}") for i in range(1500, 4500)]
    )
    db = spark.createDataFrame(big, "g string, v string")
    k = 128
    est = metrics.kmv_pair_overlap(
        metrics.kmv_bottom_k(db, ["g"], "v", k=k), "g", k=k
    ).collect()[0]
    true_j = 1500 / 4500
    assert abs(est["jaccard_est"] - true_j) < 0.15, est


def test_hash_sample_quantiles_exact_below_k(spark):
    """A group with <= k rows keeps ALL rows in the sample, so the
    discrete quantile estimate equals the exact lower order
    statistic."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions.metrics import (
        hash_sample_bottom_k,
        sample_quantiles,
    )

    e = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value"
    )
    sk = hash_sample_bottom_k(e, ["event_type"], "event_id", "value", k=10_000)
    got = {
        (r["event_type"], r["p"]): r["q_value"]
        for r in sample_quantiles(
            sk, ["event_type"], "value", ps=(0.5,), k=10_000
        ).collect()
    }
    for t, vals in (
        e.groupby("event_type")
        .agg(F.collect_list("value").alias("v"))
        .collect()
    ):
        sv = sorted(vals)
        assert got[(t, 0.5)] == sv[int(0.5 * (len(sv) - 1))], t


def test_hash_sample_sketches_merge_exactly(spark):
    """The merged global sketch (re-rank of per-type sketches) must
    reproduce the direct global sketch bit-for-bit — the q112
    identity at unit level, including under the estimator branch
    (k far below the row count)."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions.metrics import (
        hash_sample_bottom_k,
        sample_quantiles,
    )

    e = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value"
    )
    k = 64  # << 1000 rows: real sampling, not the degenerate case
    per = hash_sample_bottom_k(e, ["event_type"], "event_id", "value", k=k)
    merged = sorted(
        map(
            tuple,
            sample_quantiles(
                per.select("h", "value"), [], "value", k=k
            ).collect(),
        )
    )
    direct = sorted(
        map(
            tuple,
            sample_quantiles(
                hash_sample_bottom_k(e, [], "event_id", "value", k=k),
                [],
                "value",
                k=k,
            ).collect(),
        )
    )
    assert merged == direct and len(merged) == 4


def test_hash_sample_two_level_matches_one_level(spark):
    """The salted two-level construction must equal a naive global
    rank — the same subset identity the KMV sketch proves."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions.metrics import (
        hash_fraction,
        hash_sample_bottom_k,
    )
    from pyspark.sql.window import Window

    e = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value"
    )
    k = 32
    two = sorted(
        (r["h"], r["value"])
        for r in hash_sample_bottom_k(e, [], "event_id", "value", k=k).collect()
    )
    w = Window.orderBy("h", "value")
    one = sorted(
        (r["h"], r["value"])
        for r in e.select(
            hash_fraction(F.col("event_id")).alias("h"), "value"
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .collect()
    )
    assert two == one


def test_robust_outliers_flags_planted_anomalies(spark):
    """Tight cluster + a few extreme points: the MAD rule must flag
    exactly the planted anomalies (a mean/std z-score would already
    be dragged by them — MAD isn't), and the sketch-estimated
    med/mad must equal the exact ones below k."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions.metrics import robust_outlier_stats
    import statistics

    vals = [100.0 + (i % 7) * 0.5 for i in range(200)] + [500.0, -300.0, 900.0]
    rows = [(i, "g", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = robust_outlier_stats(
        df, ["event_type"], "event_id", "value", k=1024
    ).collect()[0]
    assert r["n"] == 203
    assert r["n_outliers"] == 3
    sv = sorted(vals)
    assert r["med_est"] == sv[(len(sv) - 1) // 2]  # exact below k
    devs = sorted(abs(v - r["med_est"]) for v in vals)
    assert r["mad_est"] == devs[(len(devs) - 1) // 2]
