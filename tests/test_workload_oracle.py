"""Every oracle-backed workload query must match DuckDB at sf0.001.

This is the local replica of the driver's t2 gate (the driver runs
sf0.01; sf0.001 keeps the suite fast — run
``SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 pytest`` for the full check).
"""

from __future__ import annotations

import os

import pytest

from cdc_pipeline_spark import workload
from tests.oracle import compare, rows_only_check

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(workload.ORACLE_SQL.keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    problems = compare(spark, workload.QUERIES[name], workload.ORACLE_SQL[name], SF_DIR)
    assert not problems, f"{name}: " + "; ".join(problems)


NO_ORACLE_QUERIES = sorted(set(workload.QUERIES) - set(workload.ORACLE_SQL))


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_rows_only_queries_execute(spark, name):
    """Queries without an oracle must survive the driver's rows-only
    canonicalization (collect + pandas sort/factorize), not just
    execute — round 1's winnowing array column passed `.count()` locally
    but crashed the real gate."""
    assert rows_only_check(spark, workload.QUERIES[name], SF_DIR) >= 0


def test_driver_window_is_exactly_fifty():
    """The correctness driver re-checks only the FIRST 50 registered
    queries. The priority list must therefore hold exactly 50 names —
    a longer list silently parks its tail outside the window while
    still reading as 'covered' (review batch 4 finding). Carryover
    names are tracked separately and must directly follow the window."""
    assert len(workload._DRIVER_WINDOW_PRIORITY) == 50
    regs = list(workload.QUERIES)
    assert regs[:50] == workload._DRIVER_WINDOW_PRIORITY
    n_carry = len(workload._DRIVER_WINDOW_CARRYOVER)
    assert regs[50 : 50 + n_carry] == workload._DRIVER_WINDOW_CARRYOVER
    # EVERY registered query must appear in one of the two lists: the
    # stated invariant is that rotation position is a recorded decision,
    # never silent registration-order fallthrough (round-5 review finding)
    listed = workload._DRIVER_WINDOW_PRIORITY + workload._DRIVER_WINDOW_CARRYOVER
    assert len(listed) == len(set(listed)), "duplicate names across window lists"
    assert set(listed) == set(workload.QUERIES)
    assert set(workload.QUERIES) == set(workload.ORACLE_SQL)
