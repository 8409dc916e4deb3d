"""Every registered query with an oracle must hash-match DuckDB at
sf0.001 (the driver gate runs the same compare at sf0.01)."""

from __future__ import annotations

import pytest

from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import registry
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    compare(spark, name, QUERIES[name], ORACLES[name], SF_SMOKE)


@pytest.mark.slow
def test_all_queries_return_rows(spark):
    # slow tier (r15): every query here also runs (and is value-checked)
    # in the parametrized parity sweep above, so this count-only pass
    # adds ~2.5 min of redundant execution to the default tier
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
