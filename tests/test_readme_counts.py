"""Round-4: README registry counts must match the live registries —
the r2 advisory was a stale count, this pins it. The README states the
counts in exactly one place (the queries/ architecture line); this test
parses that line and compares against QUERIES/ORACLES."""

from __future__ import annotations

import os
import re


def test_readme_counts_match_registries():
    from fortune_500_financial_insights_pipeline_spark.oracles import ORACLES
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    readme = os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")
    with open(readme) as f:
        text = f.read()
    m = re.search(
        r"(\d+) fixture queries \(one per SURVEY §2 operator; (\d+)\s*\n?"
        r"[^\n]*DuckDB-oracle-matched, (\d+) rows-only",
        text,
    )
    assert m, "README queries/ line not found — keep the counts in that one place"
    n_queries, n_oracle, n_rows_only = (int(g) for g in m.groups())
    assert n_queries == len(QUERIES), (n_queries, len(QUERIES))
    assert n_oracle == len(set(QUERIES) & set(ORACLES)), (
        n_oracle,
        len(set(QUERIES) & set(ORACLES)),
    )
    assert n_rows_only == len(set(QUERIES) - set(ORACLES)), (
        n_rows_only,
        sorted(set(QUERIES) - set(ORACLES)),
    )
    # every oracle key has a query (no orphaned oracle SQL)
    assert not set(ORACLES) - set(QUERIES)
