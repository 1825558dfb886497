"""Every registered query must match its DuckDB oracle at sf0.001 —
the local mirror of the driver's sf0.01 correctness gate (strict: exact
values, floats included)."""

from __future__ import annotations

import pytest

from fortune_500_financial_insights_pipeline_spark.oracles import ORACLES
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES
from fortune_500_financial_insights_pipeline_spark.testing import compare_frames, run_oracle

# round 10: heavyweight suite — excluded from the driver-budget default
# run (pytest.ini addopts), executed in full at every round close
import pytest as _pytest_r10
pytestmark = _pytest_r10.mark.slow


ORACLE_KEYS = sorted(set(QUERIES) & set(ORACLES))


def test_every_query_is_registered():
    assert QUERIES, "no queries registered"
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = run_oracle(ORACLES[name], sf_dir)
    problems = compare_frames(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and return a stable schema."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, sf_dir)
        assert df.columns, f"{name}: no columns"
        assert df.count() >= 0
