"""Property tests for the round-3h batch: growth accounting, Gumbel block
maxima. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_growth_accounting_identity(spark, sf_dir):
    out = QUERIES["q_growth_accounting"](spark, sf_dir).toPandas().sort_values("w")
    assert len(out) >= 3
    # first week: everyone is new, nobody churned yet
    f = out.iloc[0]
    assert f["n_retained"] == 0 and f["n_resurrected"] == 0 and f["n_churned"] == 0
    # active(w) = new + retained + resurrected; retained <= active(prev week)
    act = out["n_new"] + out["n_retained"] + out["n_resurrected"]
    assert (out["n_retained"].iloc[1:].values <= act.iloc[:-1].values).all()
    # churned(w) <= active(prev week)
    assert (out["n_churned"].iloc[1:].values <= act.iloc[:-1].values).all()


def test_gumbel_fit_sane(spark, sf_dir):
    r = QUERIES["q_gumbel_maxima"](spark, sf_dir).collect()[0]
    assert r["scale_beta"] > 0
    assert r["loc_mu"] > 0
    # the 52-week return level sits above the location (ln(-ln(1-1/52))<0)
    assert r["return_level_52w"] > r["loc_mu"]
    assert r["n_weeks"] >= 10
