"""Skew utilities + temporal operator unit tests on constructed data
(oracle parity for the temporal ops runs in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import skew, temporal

from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    skewed = spark.createDataFrame(
        [(1, f"v{i}") for i in range(500)] + [(2, "x"), (3, "y")],
        "k long, payload string",
    )
    other = spark.createDataFrame(
        [(1, "one"), (2, "two"), (4, "four")], "k long, name string"
    )
    plain = skewed.join(other, "k")
    salted = skew.salted_join(skewed, other, "k", salt_buckets=4)
    assert salted.count() == plain.count() == 501
    assert sorted(salted.columns) == sorted(plain.columns)
    got = {
        (r["k"], r["payload"], r["name"])
        for r in salted.collect()
    }
    want = {(r["k"], r["payload"], r["name"]) for r in plain.collect()}
    assert got == want


def test_salted_groupby_count(spark):
    df = spark.createDataFrame(
        [(1,)] * 1000 + [(2,)] * 3, "k long"
    )
    got = {r["k"]: r["count"] for r in skew.salted_groupby_count(df, "k").collect()}
    assert got == {1: 1000, 2: 3}


def test_row_salt_spreads_byte_identical_duplicates(spark):
    """The canonical skew case: one hot key mass-duplicated
    byte-for-byte.  A content-only hash would co-bucket every copy
    (the hot partition returns); the ordinal-mixed salt must spread
    them across (nearly) all buckets."""
    df = spark.createDataFrame([(1, "same")] * 2000, "k long, v string")
    buckets = 16
    n = (
        df.withColumn("s", skew._row_salt(df, buckets))
        .select("s")
        .distinct()
        .count()
    )
    assert n >= buckets - 2, f"duplicates collapsed to {n}/{buckets} salt buckets"


def test_row_salt_deterministic_with_ordinal_col(spark):
    """With a stable unique ``ordinal_col`` the salt must be a pure
    function of row content — invariant under repartitioning (and
    hence cluster-retry-safe, unlike the monotonically_increasing_id
    fallback)."""
    df = spark.createDataFrame(
        [(i, i % 3, "payload") for i in range(200)],
        "rid long, k long, v string",
    )
    buckets = 8

    def salts(frame):
        return {
            (r["rid"], r["s"])
            for r in frame.withColumn(
                "s", skew._row_salt(frame, buckets, ordinal_col="rid")
            ).collect()
        }

    base = salts(df)
    assert salts(df.repartition(13, "v")) == base
    assert salts(df.coalesce(1)) == base
    # and it still spreads: many distinct salt values
    assert len({s for _, s in base}) >= buckets - 2


def test_asof_join_backward_semantics(spark):
    quotes = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("B", 15, 50.0)],
        "sym string, t long, px double",
    )
    trades = spark.createDataFrame(
        [("A", 5), ("A", 10), ("A", 25), ("B", 14), ("C", 99)],
        "sym string, t long",
    )
    out = temporal.asof_join(
        trades, quotes, on="sym", left_time="t", right_time="t",
        right_values=["px"],
    )
    got = {(r["sym"], r["t"]): r["px"] for r in out.collect()}
    assert got[("A", 5)] is None, "no quote at-or-before t=5"
    assert got[("A", 10)] == 100.0, "tie: quote at t=10 matches"
    assert got[("A", 25)] == 101.0, "latest quote wins"
    assert got[("B", 14)] is None
    assert got[("C", 99)] is None, "unseen key passes through with null"


def test_asof_join_forward_semantics(spark):
    quotes = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0)], "sym string, t long, px double"
    )
    trades = spark.createDataFrame([("A", 15), ("A", 21)], "sym string, t long")
    out = temporal.asof_join(
        trades, quotes, on="sym", left_time="t", right_time="t",
        right_values=["px"], direction="forward",
    )
    got = {(r["sym"], r["t"]): r["px"] for r in out.collect()}
    assert got[("A", 15)] == 101.0, "earliest quote at-or-after t=15"
    assert got[("A", 21)] is None


def test_range_join_binned_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 100, 200), (2, 300, 310)], "lid long, s long, e long"
    )
    right = spark.createDataFrame(
        [(10, 99), (11, 100), (12, 199), (13, 200), (14, 305)],
        "rid long, t long",
    )
    out = temporal.range_join_binned(
        left, right, on=None,
        left_start=F.col("s"), left_end=F.col("e"),
        right_time=F.col("t"), bin_width_sec=50,
    )
    got = {(r["lid"], r["rid"]) for r in out.select("l.lid", "r.rid").collect()}
    assert got == {(1, 11), (1, 12), (2, 14)}, (
        "half-open [start, end): 100 in, 199 in, 99/200 out"
    )


def test_range_join_binned_negative_epochs(spark):
    # pre-1970 times: truncation-toward-zero binning (the old
    # double-divide + cast) puts t=-99 and start=-120 in DIFFERENT
    # bins and silently drops the match; floor binning keeps them
    left = spark.createDataFrame([(1, -120, -80)], "lid long, s long, e long")
    right = spark.createDataFrame(
        [(10, -99), (11, -120), (12, -80), (13, -121)], "rid long, t long"
    )
    out = temporal.range_join_binned(
        left, right, on=None,
        left_start=F.col("s"), left_end=F.col("e"),
        right_time=F.col("t"), bin_width_sec=50,
    )
    got = {(r["lid"], r["rid"]) for r in out.select("l.lid", "r.rid").collect()}
    assert got == {(1, 10), (1, 11)}, "half-open [-120, -80): -99/-120 in"


def test_sessionize_gap_boundaries(spark):
    df = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 101), (1, 300), (2, 0)],
        "uid long, t long",
    )
    out = temporal.sessionize(df, "uid", "t", gap=100)
    got = {(r["uid"], r["t"]): r["session_id"] for r in out.collect()}
    assert got[(1, 0)] == 1
    assert got[(1, 100)] == 1, "gap == limit stays in session"
    assert got[(1, 101)] == 1
    assert got[(1, 300)] == 2, "gap 199 > 100 starts a new session"
    assert got[(2, 0)] == 1


def test_time_weighted_avg_hand_computed(spark):
    """One key, three observations: value 10 holds 2us, value 20
    holds 6us -> twap = (10*2 + 20*6) / 8 = 17.5; the last
    observation has no duration and is dropped."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.temporal import time_weighted_avg

    rows = [
        ("a", 1, 100, 1, 10.0),
        ("a", 1, 102, 2, 20.0),
        ("a", 1, 108, 3, 99.0),  # last: no next ts, dropped
    ]
    df = spark.createDataFrame(rows, "g string, k int, t long, id int, v double")
    got = time_weighted_avg(df, "k", "t", "id", "v", "g").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["g"], r["n_segments"], r["total_dur"]) == ("a", 2, 8)
    assert r["twap"] == 17.5


def test_time_weighted_avg_groups_by_starting_row(spark):
    """A segment belongs to the group of its STARTING observation,
    even when the next observation has a different group."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.temporal import time_weighted_avg

    rows = [
        ("x", 1, 0, 1, 1.0),
        ("y", 1, 4, 2, 3.0),
        ("x", 1, 10, 3, 5.0),
        ("x", 1, 12, 4, 0.0),
    ]
    df = spark.createDataFrame(rows, "g string, k int, t long, id int, v double")
    got = {r["g"]: r for r in time_weighted_avg(df, "k", "t", "id", "v", "g").collect()}
    # x: 1.0 holds [0,4) and 5.0 holds [10,12) -> (4 + 10)/6
    assert got["x"]["n_segments"] == 2 and got["x"]["total_dur"] == 6
    assert got["x"]["twap"] == round((1.0 * 4 + 5.0 * 2) / 6, 6)
    # y: 3.0 holds [4,10)
    assert got["y"]["total_dur"] == 6 and got["y"]["twap"] == 3.0


def test_time_weighted_avg_tie_deterministic(spark):
    """Equal timestamps order by the id tiebreak: the earlier id's
    segment has zero duration, so only the later row's value holds."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.temporal import time_weighted_avg

    rows = [
        ("a", 1, 5, 1, 100.0),
        ("a", 1, 5, 2, 1.0),
        ("a", 1, 15, 3, 0.0),
    ]
    df = spark.createDataFrame(rows, "g string, k int, t long, id int, v double")
    r = time_weighted_avg(df, "k", "t", "id", "v", "g").collect()[0]
    # id=1 holds [5,5) = 0us, id=2 holds [5,15) = 10us
    assert r["n_segments"] == 2 and r["total_dur"] == 10
    assert r["twap"] == 1.0


def test_salted_grouped_topk_equals_one_level_window(spark):
    """Two-level salted top-k must equal the naive per-group window —
    the subset identity the q125 oracle relies on."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import skew

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    got = sorted(
        map(
            tuple,
            skew.salted_grouped_topk(
                o, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=5
            ).collect(),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    naive = sorted(
        map(
            tuple,
            o.select("o_orderpriority", "o_orderkey", "o_totalprice")
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 5)
            .collect(),
        )
    )
    assert got == naive and len(got) > 0


def test_salted_grouped_topk_ties_deterministic(spark):
    """Equal order values resolve by id on both levels — the total
    order that makes the subset identity exact."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import skew

    rows = [("g", i, 1.0) for i in range(100)]  # all tied
    df = spark.createDataFrame(rows, "grp string, id int, v double")
    out = skew.salted_grouped_topk(df, ["grp"], "v", "id", k=3).collect()
    assert sorted((r["id"], r["rank"]) for r in out) == [(0, 1), (1, 2), (2, 3)]


def test_grouped_topk_onelevel_equals_salted(spark):
    """salt_buckets=1 escape hatch: identical rows to the two-level
    default in both sort directions, and the one-level plan carries
    exactly one Window (no salt pre-rank)."""
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import skew

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    for desc in (True, False):
        one = skew.grouped_topk(
            o, ["o_orderpriority"], "o_totalprice", "o_orderkey",
            k=4, salt_buckets=1, descending=desc,
        )
        two = skew.grouped_topk(
            o, ["o_orderpriority"], "o_totalprice", "o_orderkey",
            k=4, salt_buckets=64, descending=desc,
        )
        assert sorted(map(tuple, one.collect())) == sorted(
            map(tuple, two.collect())
        )
    # the one-level plan has strictly fewer Window nodes than the
    # two-level (no salt pre-rank); AQE plan strings repeat sections,
    # so compare counts rather than asserting an absolute
    p1 = one._jdf.queryExecution().executedPlan().toString()
    p2 = two._jdf.queryExecution().executedPlan().toString()
    assert 0 < p1.count("Window") < p2.count("Window")


def test_exact_dup_groups_small_equals_default(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    small = dedupe.exact_dup_groups_small(d, "doc_id", "text")
    default = dedupe.exact_dup_groups(d, "doc_id", "text")
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, default.collect())
    )


def test_exact_dup_groups_auto_dispatch(spark):
    """The size dispatcher picks the one-level window below the row
    threshold and the skew-proof two-level form above it — output
    identical either way (both already pinned equal above)."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    small = dedupe.exact_dup_groups_auto(d, "doc_id", "text")
    # below the threshold: one Window, no join-back aggregate pair
    p = small._jdf.queryExecution().executedPlan().toString()
    assert p.count("Window") > 0
    big = dedupe.exact_dup_groups_auto(d, "doc_id", "text", window_max_rows=1)
    pb = big._jdf.queryExecution().executedPlan().toString()
    assert pb.count("Window") == 0
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, big.collect())
    )
