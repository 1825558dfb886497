"""Lock the driver-check ordering contract in __spark_entry__.queries().

The driver truncates its per-round correctness pass (rounds 1-2: first 50
keys), so the exposed order decides which keys earn a hard CORRECTNESS row.
Round-2 verdict item 1: flagship LLM-pipeline keys first, SQL surface last
within the unverified class.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_complete_and_unique(entry_mod):
    from fortune_500_financial_insights_pipeline_spark.oracles import ORACLES
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    ordered = list(entry_mod.queries())
    assert len(ordered) == len(set(ordered)) == len(QUERIES)
    # every oracle key refers to a registered query
    assert set(ORACLES) <= set(QUERIES)


def test_flagship_llm_keys_lead(entry_mod):
    ordered = list(entry_mod.queries())
    verified = entry_mod._verified_rounds()
    flagship = [k for k in entry_mod._FLAGSHIP_LLM if k not in verified]
    # every still-unverified flagship key sits in the head of the queue,
    # in curated order
    assert ordered[: len(flagship)] == flagship


def test_sql_surface_last_among_unverified(entry_mod):
    from fortune_500_financial_insights_pipeline_spark.oracles import ORACLES

    ordered = list(entry_mod.queries())
    verified = entry_mod._verified_rounds()
    pos = {k: i for i, k in enumerate(ordered)}
    unverified_oracle = [
        k for k in ordered if k not in verified and k in ORACLES
    ]
    sql = [k for k in unverified_oracle if k.startswith("q_sql_")]
    nonsql = [k for k in unverified_oracle if not k.startswith("q_sql_")]
    if sql and nonsql:
        assert min(pos[k] for k in sql) > max(pos[k] for k in nonsql)


def test_verified_keys_rotate_to_back(entry_mod):
    ordered = list(entry_mod.queries())
    verified = entry_mod._verified_rounds()
    if not verified:
        pytest.skip("no CORRECTNESS files present")
    pos = {k: i for i, k in enumerate(ordered)}
    first_verified = min(pos[k] for k in verified if k in pos)
    last_unverified = max(
        (pos[k] for k in ordered if k not in verified), default=-1
    )
    assert first_verified > last_unverified
