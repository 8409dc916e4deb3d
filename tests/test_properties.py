"""Property-based tests (SURVEY 5.5) with hypothesis: cleaning never
invents values, dedupe is idempotent, SCD2 invariants hold under
arbitrary batch sequences."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import cleanse
from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import scd2

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

dirty_value = st.one_of(
    st.none(),
    st.sampled_from(["ERR", "TEMP_ERR", "COST_ERR", "EXP_ERR", "BAD_AMOUNT", "", "-"]),
    st.integers(-1000, 1000).map(str),
    st.text(alphabet="abcxyz!@# .", max_size=8),
)


@SLOW
@given(st.lists(dirty_value, min_size=1, max_size=30))
def test_clean_cast_never_invents(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    out = df.select("x", cleanse.clean_cast("x", "int").alias("y")).collect()
    for r in out:
        if r["y"] is not None:
            # non-null output requires a parseable non-marker input
            assert r["x"] is not None
            assert r["x"].strip() not in cleanse.DEFAULT_MARKERS
            assert int(r["x"].strip()) == r["y"]


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 5).map(str), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    )
)
def test_dropduplicates_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long")
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    n_distinct = len(set(rows))
    assert once.count() == n_distinct


@SLOW
@given(
    st.lists(
        st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 3)),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_scd2_invariants_under_random_batches(spark, batches):
    spec = scd2.Scd2Spec(keys=["k"], order_by=["v"])
    state = None
    seen_keys: set[int] = set()
    for i, batch_rows in enumerate(batches):
        if not batch_rows:
            continue
        batch = spark.createDataFrame(batch_rows, "k long, v long")
        pdate = f"2026-{i + 1:02d}-01"
        if state is None:
            state = scd2.initial_load(batch, spec, pdate)
        else:
            state = scd2.merge(state, batch, spec, pdate)
        seen_keys |= {k for k, _ in batch_rows}
    if state is None:
        return
    v = scd2.validate(state, spec)
    assert v == {
        "multi_current_keys": 0,
        "end_before_effective": 0,
        "expired_without_end": 0,
    }
    # exactly one current row per ever-seen key
    current_keys = {
        r["k"] for r in state.filter(F.col("is_current")).collect()
    }
    assert current_keys == seen_keys


# -- connected components vs union-find oracle -------------------------

edge = st.tuples(st.integers(0, 20), st.integers(0, 20)).filter(
    lambda e: e[0] != e[1]
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    # canonical representative = min node id in the component
    comps: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comps[r] = min(comps.get(r, n), n)
    return {n: comps[find(n)] for n in parent}


@SLOW
@given(st.lists(edge, min_size=1, max_size=40))
def test_connected_components_matches_union_find(spark, edges):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.components import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)


@SLOW
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=40),
    st.sampled_from([4, 16, 256]),
)
def test_kmv_exact_branch_and_bounds(spark, values, k):
    """KMV invariants for arbitrary inputs: below k distinct values the
    sketch IS the exact count; above, the estimate is positive and the
    result is a pure function of the distinct value set (duplicates
    never move it)."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions.metrics import kmv_distinct

    df = spark.createDataFrame([(v,) for v in values], "x long").withColumn(
        "g", F.lit(1)
    )
    est = kmv_distinct(df, ["g"], "x", k=k).collect()[0]["approx_distinct"]
    exact = len(set(values))
    if exact < k:
        assert est == exact
    else:
        assert est > 0
    dup = spark.createDataFrame(
        [(v,) for v in values * 2], "x long"
    ).withColumn("g", F.lit(1))
    est_dup = kmv_distinct(dup, ["g"], "x", k=k).collect()[0]["approx_distinct"]
    assert est_dup == est
