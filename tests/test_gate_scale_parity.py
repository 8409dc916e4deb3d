"""Dress rehearsal of the driver's correctness gate at sf0.01.

The cheap suite runs every oracle at sf0.001, but some cross-engine
divergences only materialize with more rows (e.g. round() ties appear
once enough values exist to land on a .005 boundary — q10 passed at
sf0.001 and failed at sf0.01 before its fix).  This test runs the
full catalog at the gate scale; it is slower (~3 min) and marked so
it can be deselected with ``-m "not gate"`` during tight loops.
"""

from __future__ import annotations

import pytest

from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import registry
from tests.conftest import SF_CORRECT
from tests.oracle_harness import compare

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()

# gate keeps the historical deselect handle; slow keeps the sf0.01
# full-catalog rehearsal out of the default fast tier (r15 — the
# sf0.001 parity suite covers every oracle by default)
pytestmark = [pytest.mark.gate, pytest.mark.slow]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_gate_scale_parity(spark, name):
    compare(spark, name, QUERIES[name], ORACLES[name], SF_CORRECT)
