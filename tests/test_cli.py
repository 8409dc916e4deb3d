"""CLI smoke: the notebook-equivalent workflow end-to-end through
argparse (silver -> gold -> validate -> refresh), sharing the session
fixture so no second JVM spins up."""

from __future__ import annotations

import json

from hospital_data_engineering_pipeline_end_to_end_project_spark import cli
from hospital_data_engineering_pipeline_end_to_end_project_spark.testing import datagen


def test_cli_workflow(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(cli, "_spark", lambda cpus: spark)
    raw, wh = str(tmp_path / "raw"), str(tmp_path / "wh")
    datagen.generate(
        raw, seed=3, n_patients=40, n_doctors=8, n_admissions=60,
        n_vitals=60, n_procedures=60, n_billing=60,
    )

    assert cli.main(["silver", "--raw", raw, "--warehouse", wh,
                     "--date", "2026-01-15"]) == 0
    silver = json.loads(capsys.readouterr().out)
    assert silver["billing"]["rows"] > 0

    assert cli.main(["gold", "--warehouse", wh]) == 0
    gold = json.loads(capsys.readouterr().out)
    assert gold["agg_revenue_month"] > 0

    assert cli.main(["validate", "--warehouse", wh]) == 0
    v = json.loads(capsys.readouterr().out)
    assert all(sum(e.values()) == 0 for e in v.values())

    # refresh one real month through the CLI month parser
    import os

    from pyspark.sql import functions as F
    fb = spark.read.parquet(os.path.join(wh, "gold", "fact_billing"))
    y, m = fb.filter(F.col("year").isNotNull()).select("year", "month").first()
    assert cli.main(["refresh", "--warehouse", wh, "--fact", "fact_billing",
                     "--months", f"{y}-{m:02d}"]) == 0
    r = json.loads(capsys.readouterr().out)
    assert r["rows_refreshed"] > 0 and r["agg_revenue_month"] > 0


def test_cli_zorder_rewrites_table(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(cli, "_spark", lambda cpus: spark)
    from pyspark.sql import functions as F

    path = str(tmp_path / "zt")
    spark.range(0, 2048).select(
        (F.col("id") * 7 % 2048).cast("double").alias("x"),
        (F.col("id") * 13 % 2048).cast("double").alias("y"),
    ).repartition(10).write.parquet(path)

    assert cli.main(
        ["zorder", "--path", path, "--by", "x,y", "--num-files", "4"]
    ) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["files_before"] == 10 and out["files_after"] == 4
    assert spark.read.parquet(path).count() == 2048
