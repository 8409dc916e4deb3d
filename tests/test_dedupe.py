

def test_cluster_keepers_quality_and_ties(spark):
    """Keeper = max quality, lowest id on ties; singleton clusters kept;
    member counts exact."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7), (5, 5)],
        "node long, label long",
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (7, 4), (9, 4), (5, 2)],
        "doc_id long, q long",
    )
    got = {
        r["label"]: (r["keeper_doc"], r["keeper_quality"], r["n_members"])
        for r in dedupe.cluster_keepers(labels, docs, "doc_id", "q").collect()
    }
    # label 1: quality tie 30/30 between docs 2 and 3 -> lowest id 2
    # label 7: tie 4/4 between 7 and 9 -> 7; label 5: singleton
    assert got == {1: (2, 30, 3), 7: (7, 4, 2), 5: (5, 2, 1)}
