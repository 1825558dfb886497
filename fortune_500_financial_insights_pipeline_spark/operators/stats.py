"""Tabular information / concentration statistics: information gain of a
categorical predictor, Gini coefficient of a value distribution.

Both are one-or-few-row deliverables computed from exact-count contingency
frames — the feature-screening and inequality metrics an analytics layer
derives before modeling ("does order priority predict status at all?",
"how concentrated is revenue across customers?").

Exactness discipline: every probability is a ratio of exact longs; entropy
terms p·log2(p) are per-row IEEE expressions (log2 agrees bit-for-bit
across engines on identical doubles — the char_entropy precedent) and
cross-row sums run in fixed point (functions/deterministic.dsum), so both
statistics hash-match a single-threaded oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum


def info_gain(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """One row: (h_y, h_y_given_x, info_gain) in bits — the mutual
    information between a categorical predictor ``x_col`` and target
    ``y_col``, computed from the exact (x, y) contingency counts.
    H(Y) from the y marginals; H(Y|X) = Σ_x p(x)·H(Y|x) folded as
    Σ_{x,y} (n_xy/N)·log2(n_x/n_xy).  Cell counts bound the reduced
    frame (|X|·|Y| rows), so the statistic costs one scan + tiny
    aggregates at any table size."""
    cells = df.groupBy(x_col, y_col).agg(F.count(F.lit(1)).alias("__nxy"))
    xtot = cells.groupBy(x_col).agg(F.sum("__nxy").alias("__nx"))
    ytot = cells.groupBy(y_col).agg(F.sum("__nxy").alias("__ny"))
    n = cells.agg(F.sum("__nxy").alias("__n"))
    py = F.col("__ny").cast("double") / F.col("__n")
    h_y = ytot.crossJoin(F.broadcast(n)).agg(
        (-dsum(py * F.log2(py))).alias("h_y")
    )
    joined = cells.join(F.broadcast(xtot), x_col).crossJoin(F.broadcast(n))
    term = (F.col("__nxy").cast("double") / F.col("__n")) * F.log2(
        F.col("__nx").cast("double") / F.col("__nxy")
    )
    h_cond = joined.agg(dsum(term).alias("h_y_given_x"))
    return h_y.crossJoin(h_cond).select(
        "h_y",
        "h_y_given_x",
        (F.col("h_y") - F.col("h_y_given_x")).alias("info_gain"),
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """One row: (n, total, gini) — the Gini concentration coefficient of
    a non-negative integer value distribution via the sorted-rank
    formula G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n.  Rank positions come
    from one global sort over the AGGREGATE-sized value frame (one row
    per entity — aggregate first), ties broken on ``tiebreak_col`` (the
    formula is tie-permutation invariant because equal values swap
    ranks symmetrically... their contribution i·x sums to the same
    total).  Σ i·x and Σx are exact longs; the final expression is one
    fixed-order double computation."""
    w = W.orderBy(value_col, tiebreak_col)
    ranked = df.select(
        F.col(value_col).cast("long").alias("__x"),
        F.row_number().over(w).cast("long").alias("__i"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("total"),
        F.sum(F.col("__i") * F.col("__x")).alias("__ix"),
    )
    n = F.col("n").cast("double")
    gini = (
        F.lit(2.0) * F.col("__ix").cast("double") / (n * F.col("total").cast("double"))
        - (n + 1) / n
    )
    return agg.select("n", "total", F.round(gini, 6).alias("gini"))


def historical_var_es(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    q_num: int = 19,
    q_den: int = 20,
) -> DataFrame:
    """Historical Value-at-Risk and Expected Shortfall per group at
    confidence q = q_num/q_den (default 95%), upper-tail convention:
    VaR is the order statistic at rank ceil(q·n) of the ascending sort,
    ES the mean of the tail at-or-above that rank — the two numbers a
    risk report quotes together (ES answers "how bad is it WHEN the
    VaR level is breached").

    Exactness: the quantile rank is computed in INTEGER arithmetic
    (ceil(q·n) = (q_num·n + q_den − 1) div q_den) — no float quantile
    interpolation to disagree across engines; ties are broken on
    ``tiebreak_col`` so the order statistic is total-order determined;
    the tail mean uses the fixed-point exact-sum interior.

    Spark shape: one shuffle on the group key for the ranking window,
    then a hash re-aggregate — the tail filter is rank-based so no
    second pass over the data is needed.
    """
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg

    w = W.partitionBy(*group_cols).orderBy(value_col, tiebreak_col)
    cnt = W.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        F.col(value_col).cast("double").alias("__v"),
        F.row_number().over(w).cast("long").alias("__rk"),
        F.count(F.lit(1)).over(cnt).cast("long").alias("__n"),
    )
    var_rank = ((F.lit(q_num) * F.col("__n") + (q_den - 1)) / F.lit(q_den)).cast("long")
    tail = ranked.where(F.col("__rk") >= var_rank)
    return tail.groupBy(*group_cols).agg(
        F.round(F.min("__v"), 6).alias("var"),
        F.round(davg("__v"), 6).alias("es"),
        F.count(F.lit(1)).alias("n_tail"),
    )


def ks_statistic(
    df: DataFrame,
    group_col: str,
    value_col: str,
    g1,
    g2,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the value
    distributions of two groups: D = max over observed values of
    |ECDF₁(v) − ECDF₂(v)| — the distribution-drift test a pipeline runs
    when a new data source lands (same shape as the old one, or not?).

    Exact, not sampled: per-DISTINCT-VALUE group counts come from one
    hash aggregate (the shuffle is bounded by distinct-value
    cardinality, not row count), the two running counts are one
    window pass over that aggregate-sized frame, and the ECDF
    difference is a fixed-order double expression — bit-identical to a
    single-threaded oracle. The global window is a deliberate
    single-partition pass over the distinct-value frame (same budget
    class as gini_coefficient's global sort); at extreme cardinality
    pre-bin values first.
    """
    two = df.where(F.col(group_col).isin([g1, g2])).select(
        F.col(group_col).alias("__g"), F.col(value_col).cast("double").alias("__v")
    )
    per_val = two.groupBy("__v").agg(
        F.sum(F.when(F.col("__g") == g1, 1).otherwise(0)).alias("__c1"),
        F.sum(F.when(F.col("__g") == g2, 1).otherwise(0)).alias("__c2"),
    )
    w = W.orderBy("__v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per_val.select(
        F.sum("__c1").over(w).cast("long").alias("__r1"),
        F.sum("__c2").over(w).cast("long").alias("__r2"),
    )
    totals = cum.agg(F.max("__r1").alias("n1"), F.max("__r2").alias("n2"))
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.round(
                F.max(
                    F.abs(
                        F.col("__r1").cast("double") / F.col("n1")
                        - F.col("__r2").cast("double") / F.col("n2")
                    )
                ),
                6,
            ).alias("ks"),
        )
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC AUC of a score against a binary label via the
    tie-corrected rank-sum (Mann–Whitney) identity — the quality-filter
    calibration number a curation pipeline tracks for its fastText-style
    classifiers (does the score actually rank positives above
    negatives?).

    INTEGER-exact: per-distinct-score counts come from one hash
    aggregate; average ranks are kept DOUBLED (2·rank is an integer:
    2·cum_before + n_tied + 1) so the whole rank sum is an exact long —
    no float rank arithmetic to drift cross-engine. The only division is
    the final AUC expression. Shuffle is bounded by distinct-score
    cardinality; the ordering window runs over that aggregate-sized
    frame (same budget class as gini_coefficient).
    """
    lab = F.col(label_col).cast("long")
    per_val = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(lab).alias("__np"),
        F.count(F.lit(1)).alias("__nt"),
    )
    w = W.orderBy("__s").rowsBetween(W.unboundedPreceding, W.currentRow)
    ranked = per_val.select(
        "__np",
        "__nt",
        (F.sum("__nt").over(w) - F.col("__nt")).alias("__cum_before"),
    )
    agg = ranked.agg(
        F.sum("__np").cast("long").alias("n_pos"),
        (F.sum("__nt") - F.sum("__np")).cast("long").alias("n_neg"),
        F.sum(
            F.col("__np") * (2 * F.col("__cum_before") + F.col("__nt") + 1)
        ).cast("long").alias("__s2"),
    )
    auc = (
        F.col("__s2").cast("double") - F.col("n_pos").cast("double") * (F.col("n_pos") + 1)
    ) / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg"))
    return agg.select("n_pos", "n_neg", F.round(auc, 6).alias("auc"))


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins: probability scores cut into equal-width
    bins, each reporting mean predicted probability vs observed positive
    rate — the is-the-classifier-honest readout that pairs with roc_auc
    (AUC measures ranking, calibration measures the probabilities
    themselves). One hash aggregate on the bin id; exact integer counts
    and fixed-point score means."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg

    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    ).alias("bin")
    lab = F.col(label_col).cast("long")
    return (
        df.select(b, F.col(score_col).alias("__s"), lab.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").cast("long").alias("n_pos"),
            F.round(davg("__s"), 6).alias("mean_score"),
            F.round(F.sum("__y").cast("double") / F.count(F.lit(1)), 6).alias("pos_rate"),
        )
    )


def chi2_independence(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Pearson chi-squared test of independence for two categoricals:
    Σ (observed − expected)²/expected over the contingency table, with
    expected = row_total·col_total/n — the screening statistic that
    complements info_gain (same contingency scan, frequentist scale).
    Counts are exact longs from one hash aggregate; per-cell terms are
    fixed-order double expressions folded in fixed point, so the
    statistic hash-matches a single-threaded oracle. Shuffles are
    bounded by category cardinalities."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum

    cells = df.groupBy(
        F.col(col_x).alias("__x"), F.col(col_y).alias("__y")
    ).agg(F.count(F.lit(1)).alias("__nxy"))
    xt = cells.groupBy("__x").agg(F.sum("__nxy").alias("__nx"))
    yt = cells.groupBy("__y").agg(F.sum("__nxy").alias("__ny"))
    nn = cells.agg(
        F.sum("__nxy").alias("__n"),
        F.countDistinct("__x").alias("__dx"),
        F.countDistinct("__y").alias("__dy"),
    )
    # full cross of observed categories: zero cells still carry an
    # expected count, so they MUST contribute (0 - exp)^2 / exp
    j = (
        xt.crossJoin(F.broadcast(yt))
        .join(cells, ["__x", "__y"], "left")
        .withColumn("__nxy", F.coalesce("__nxy", F.lit(0)))
        .crossJoin(F.broadcast(nn))
    )
    exp = F.col("__nx").cast("double") * F.col("__ny") / F.col("__n")
    term = (F.col("__nxy").cast("double") - exp) * (F.col("__nxy") - exp) / exp
    return j.agg(
        F.max("__n").cast("long").alias("n"),
        ((F.max("__dx") - 1) * (F.max("__dy") - 1)).cast("long").alias("dof"),
        F.round(dsum(term), 6).alias("chi2"),
    )


def woe_iv(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Weight-of-evidence / information-value per equal-width score bin —
    the credit-scoring readout (how strongly does each score band
    separate positives from negatives, and how much total signal does
    the feature carry). Laplace-smoothed (+1 per class per bin) so empty
    classes never hit ln(0), deterministically on both engines.

    One hash aggregate on the bin id; totals broadcast back; WoE and the
    IV term are fixed-order double expressions over exact longs."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    ).alias("bin")
    lab = F.col(label_col).cast("long")
    bins = (
        df.select(b, lab.alias("__y"))
        .groupBy("bin")
        .agg(
            F.sum("__y").cast("long").alias("n_pos"),
            (F.count(F.lit(1)) - F.sum("__y")).cast("long").alias("n_neg"),
        )
    )
    tot = bins.agg(
        F.sum(F.col("n_pos") + 1).alias("__tp"),
        F.sum(F.col("n_neg") + 1).alias("__tn"),
    )
    pp = (F.col("n_pos") + 1).cast("double") / F.col("__tp")
    pn = (F.col("n_neg") + 1).cast("double") / F.col("__tn")
    woe = F.log(pp / pn)
    return bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_pos",
        "n_neg",
        F.round(woe, 6).alias("woe"),
        F.round((pp - pn) * woe, 6).alias("iv_term"),
    )


def psi(
    df: DataFrame,
    group_col: str,
    value_col: str,
    g_ref,
    g_new,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Population stability index between a reference and a new group's
    value distribution over fixed equal-width bins on [lo, hi):
    Σ (p_new − p_ref)·ln(p_new/p_ref) — the score-drift alarm risk
    teams page on (PSI > 0.2 = investigate). Laplace-smoothed (+1 per
    bin per group) so bins empty on one side stay finite, identically on
    both engines. Values outside [lo, hi) clamp into the edge bins.
    One hash aggregate on the bin id; single-row output."""
    width = (hi - lo) / n_bins
    b = F.greatest(
        F.lit(0),
        F.least(
            F.floor((F.col(value_col) - lo) / width).cast("int"), F.lit(n_bins - 1)
        ),
    )
    two = df.where(F.col(group_col).isin([g_ref, g_new])).select(
        b.alias("__b"), F.col(group_col).alias("__g")
    )
    bins = two.groupBy("__b").agg(
        (F.sum(F.when(F.col("__g") == g_ref, 1).otherwise(0)) + 1).alias("__cr"),
        (F.sum(F.when(F.col("__g") == g_new, 1).otherwise(0)) + 1).alias("__cn"),
    )
    tot = bins.agg(F.sum("__cr").alias("__tr"), F.sum("__cn").alias("__tn"))
    p_ref = F.col("__cr").cast("double") / F.col("__tr")
    p_new = F.col("__cn").cast("double") / F.col("__tn")
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum

    return (
        bins.crossJoin(F.broadcast(tot))
        .agg(
            F.round(dsum((p_new - p_ref) * F.log(p_new / p_ref)), 6).alias("psi"),
            (F.sum("__cr") - F.count(F.lit(1))).cast("long").alias("n_ref"),
            (F.sum("__cn") - F.count(F.lit(1))).cast("long").alias("n_new"),
        )
    )


# Cramer's-rule determinant expressions for the 2-feature OLS normal
# equations, written ONCE as SQL text and used verbatim by BOTH engines
# (F.expr here, pasted into the DuckDB oracle) — identical parse, identical
# IEEE evaluation order, so the coefficients are bit-exact cross-engine.
OLS2_DET = "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2))"
OLS2_DET0 = "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y))"
OLS2_DET1 = "(n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2))"
OLS2_DET2 = "(n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2))"


def ols2(
    df: DataFrame,
    group_cols: list[str],
    y_col: str,
    x1_col: str,
    x2_col: str,
) -> DataFrame:
    """Two-feature OLS with intercept per group, solved in closed form:
    one pass accumulates the normal-equation moment sums (all exact
    fixed-point folds), then Cramer's rule on the 3×3 system yields
    β₀, β₁, β₂ as pure column expressions — multiple regression as
    relational algebra, no solver, no collect, no iteration (the
    multi-feature step up from the regr_* aggregate family).

    The determinant arithmetic is shared SQL text (OLS2_DET*) evaluated
    by both engines, so results hash-match exactly. One hash aggregate;
    shuffle carries 9 moments per group.

    Input spread up front (ensure_min_parallelism, projected to the four
    read columns): the nine fixed-point moment folds are the cost, and a
    single-row-group parquet scan pins them to one task (the
    q_mahalanobis lesson, round 9); no-op for inputs that split."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    df = ensure_min_parallelism(
        df.select(*group_cols, y_col, x1_col, x2_col), y_col
    )
    x1, x2, yv = F.col(x1_col), F.col(x2_col), F.col(y_col)
    mom = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x1).alias("s1"),
        dsum(x2).alias("s2"),
        dsum(yv).alias("sy"),
        dsum(x1 * x1).alias("s11"),
        dsum(x1 * x2).alias("s12"),
        dsum(x2 * x2).alias("s22"),
        dsum(x1 * yv).alias("s1y"),
        dsum(x2 * yv).alias("s2y"),
    )
    return mom.select(
        *group_cols,
        F.col("n").cast("long").alias("n_rows"),
        F.round(F.expr(f"{OLS2_DET0} / {OLS2_DET}"), 6).alias("beta0"),
        F.round(F.expr(f"{OLS2_DET1} / {OLS2_DET}"), 6).alias("beta1"),
        F.round(F.expr(f"{OLS2_DET2} / {OLS2_DET}"), 6).alias("beta2"),
    )


# Shared SQL text for the 2-feature Mahalanobis distance and the 2x2
# covariance eigenvalues (same cross-engine bit-exactness contract as
# OLS2_DET*: one string, two engines, identical IEEE evaluation order).
MAHA_D2 = (
    "((s22 * (dx1 * dx1) - (2.0 * s12) * (dx1 * dx2) + s11 * (dx2 * dx2))"
    " / (s11 * s22 - s12 * s12))"
)
PCA_DISC = "sqrt((s11 + s22) * (s11 + s22) - 4.0 * (s11 * s22 - s12 * s12))"


def _central_moments2(df: DataFrame, group_cols, x1_col, x2_col) -> DataFrame:
    """(groups, m1, m2, s11, s12, s22): means and population covariance of
    two features from one exact fixed-point aggregate pass."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum

    x1, x2 = F.col(x1_col), F.col(x2_col)
    mom = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        dsum(x1).alias("__s1"),
        dsum(x2).alias("__s2"),
        dsum(x1 * x1).alias("__s11"),
        dsum(x1 * x2).alias("__s12"),
        dsum(x2 * x2).alias("__s22"),
    )
    n = F.col("__n")
    m1 = F.col("__s1") / n
    m2 = F.col("__s2") / n
    return mom.select(
        *group_cols,
        m1.alias("m1"),
        m2.alias("m2"),
        (F.col("__s11") / n - m1 * m1).alias("s11"),
        (F.col("__s12") / n - m1 * m2).alias("s12"),
        (F.col("__s22") / n - m2 * m2).alias("s22"),
    )


def mahalanobis_outliers(
    df: DataFrame,
    group_cols: list[str],
    x1_col: str,
    x2_col: str,
    tiebreak_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Top-k multivariate outliers per group by squared Mahalanobis
    distance over two features — the correlation-aware outlier score
    (a point can be normal in each marginal yet wildly off the joint
    trend; Euclidean z-scores miss it). The 2×2 covariance inverse is
    closed-form, so the whole detector is: one exact moment aggregate,
    a broadcast join back, one row-local distance expression (shared
    SQL text, bit-exact cross-engine), and a WindowGroupLimit top-k.

    The input is projected to the five columns the detector reads and
    routed through ensure_min_parallelism: both passes (moment aggregate
    and the scored top-k scan) are CPU-dense, and a compact single-row-
    group parquet cannot split — without the up-front spread ONE task
    paid the whole 600k-row decimal moment sum and distance scan
    (measured 2.3 s → 0.96 s at sf0.1, round 9; no-op on inputs that
    already split)."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    df = ensure_min_parallelism(
        df.select(*group_cols, x1_col, x2_col, *tiebreak_cols), *tiebreak_cols
    )
    stats = _central_moments2(df, group_cols, x1_col, x2_col)
    j = df.join(F.broadcast(stats), group_cols).withColumns(
        {
            "dx1": F.col(x1_col) - F.col("m1"),
            "dx2": F.col(x2_col) - F.col("m2"),
        }
    )
    scored = j.withColumn("d2", F.round(F.expr(MAHA_D2), 6))
    w = W.partitionBy(*group_cols).orderBy(F.col("d2").desc(), *tiebreak_cols)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*group_cols, *tiebreak_cols, "d2", "rank")
    )


def pca_spectrum2(
    df: DataFrame,
    group_cols: list[str],
    x1_col: str,
    x2_col: str,
) -> DataFrame:
    """Eigenvalues + explained-variance ratio of the 2-feature covariance
    per group — the PCA spectrum in closed form (the 2×2 characteristic
    polynomial needs only sqrt, which is correctly-rounded IEEE on every
    engine; no iterative eigensolver, no collect). The how-redundant-are
    -these-features screening number."""
    stats = _central_moments2(df, group_cols, x1_col, x2_col)
    disc = F.expr(PCA_DISC)
    lam1 = (F.col("s11") + F.col("s22") + disc) / 2.0
    lam2 = (F.col("s11") + F.col("s22") - disc) / 2.0
    return stats.select(
        *group_cols,
        F.round(lam1, 6).alias("lambda1"),
        F.round(lam2, 6).alias("lambda2"),
        F.round(lam1 / (lam1 + lam2), 6).alias("evr1"),
    )


def hill_tail_index(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 50,
) -> DataFrame:
    """Hill estimator of the power-law tail exponent per group:
    α = k / Σ_{i=1..k} ln(x_(i) / x_(k+1)) over the k largest values —
    the heavy-tail diagnostic behind skew planning (a shuffle key whose
    frequency tail has α < 2 has unbounded variance: salting is not
    optional). Hill 1975; the standard order-statistics estimator.

    One rank window per group (top-(k+1) only — WindowGroupLimit prunes
    the rest map-side), per-row ln ratios against the (k+1)-th order
    statistic, fixed-point sum — deterministic under value ties because
    equal boundary values contribute identical ratios. Groups with fewer
    than k+1 rows or a zero ratio sum return NULL α, mirrored by the
    oracle.
    """
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import _fixed

    wr = W.partitionBy(*group_cols).orderBy(F.desc("__x"))
    wg = W.partitionBy(*group_cols)
    ranked = (
        df.select(*group_cols, F.col(value_col).cast("double").alias("__x"))
        .withColumn("__r", F.row_number().over(wr))
        .where(F.col("__r") <= k + 1)
        .withColumn("__xk1", F.max(F.when(F.col("__r") == k + 1, F.col("__x"))).over(wg))
    )
    term = F.log(F.col("__x") / F.col("__xk1"))
    agg = (
        ranked.where(F.col("__r") <= k)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            (F.sum(_fixed(term)).cast("double") / 1000000).alias("__s"),
            F.min("__xk1").alias("__xk1"),
        )
    )
    alpha = F.when(
        (F.col("__n") == k) & F.col("__xk1").isNotNull() & (F.col("__s") > 0),
        F.lit(float(k)) / F.col("__s"),
    )
    return agg.select(
        *group_cols,
        F.lit(k).alias("k"),
        F.round("__xk1", 6).alias("x_k1"),
        F.round(alpha, 6).alias("alpha"),
    )


def anova_oneway(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """One-way ANOVA F test: does the mean of ``value_col`` differ across
    ``group_col`` levels?  SS_between / SS_within from ONE grouped moment
    pass (n, Σx, Σx² per group) plus a tiny k-row reduce — no second scan
    of the data.  The frequentist mean-difference screen beside q_ab_test
    (two groups) and q_chi2 (categoricals).

    Exactness: per-group sums use the fixed-point interior; the k-row
    final fold rounds each group's SS term to 1e-6 before summing, so the
    statistic is order-free and hash-matches a single-threaded oracle.
    Caller should pre-scale the value column so x² stays inside the
    fixed-point ceiling (micro-units × rows < 2⁶³)."""
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("__ng"),
        dsum(value_col).alias("__sg"),
        dsum(F.col(value_col) * F.col(value_col)).alias("__ssg"),
    )
    tot = g.agg(
        F.sum("__ng").alias("__n"),
        F.round(F.sum(F.round(F.col("__sg") * 1000000).cast("long")).cast("double") / 1000000, 6).alias("__s"),
        F.count(F.lit(1)).alias("__k"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ng = F.col("__ng").cast("double")
    mg = F.col("__sg") / ng
    grand = F.col("__s") / F.col("__n").cast("double")
    between_term = ng * (mg - grand) * (mg - grand)
    within_term = F.col("__ssg") - F.col("__sg") * F.col("__sg") / ng
    red = j.groupBy().agg(
        F.max("__n").cast("long").alias("n"),
        F.max("__k").cast("long").alias("k"),
        dsum(between_term).alias("ss_between"),
        dsum(within_term).alias("ss_within"),
    )
    msb = F.col("ss_between") / (F.col("k") - 1).cast("double")
    msw = F.col("ss_within") / (F.col("n") - F.col("k")).cast("double")
    return red.select(
        "n",
        "k",
        F.round("ss_between", 6).alias("ss_between"),
        F.round("ss_within", 6).alias("ss_within"),
        F.round(msb / msw, 6).alias("f_stat"),
    )


def spearman_by_group(
    df: DataFrame, col_a: str, col_b: str, group_col: str
) -> DataFrame:
    """Spearman rank correlation of two numeric columns inside each group,
    tie-aware, with an EXACT integer interior: the tie-averaged rank is
    kept doubled (2·avg_rank = 2·min_rank + tie_count − 1, always an
    integer) and centered by its exact mean (n+1), so every cross moment
    is a plain long sum — no float accumulation anywhere before the final
    ratio.  ρ = Σc_a·c_b / (√Σc_a²·√Σc_b²).

    Scale: two rank windows per group (one sort each); |c| ≤ n keeps the
    products inside int64 up to ~10⁶ rows per group — beyond that, swap
    the sums to DECIMAL(38,0).  For 100 TB use bucketed range-ranking
    instead of a single per-group window."""
    wa = W.partitionBy(group_col).orderBy(F.col(col_a).asc())
    wb = W.partitionBy(group_col).orderBy(F.col(col_b).asc())
    ta = W.partitionBy(group_col, col_a)
    tb = W.partitionBy(group_col, col_b)
    wn = W.partitionBy(group_col)
    r = df.select(
        F.col(group_col).alias("grp"),
        (2 * F.rank().over(wa) + F.count(F.lit(1)).over(ta) - 1).cast("long").alias("__ra"),
        (2 * F.rank().over(wb) + F.count(F.lit(1)).over(tb) - 1).cast("long").alias("__rb"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    c = r.select(
        "grp",
        (F.col("__ra") - (F.col("__n") + 1)).alias("__ca"),
        (F.col("__rb") - (F.col("__n") + 1)).alias("__cb"),
    )
    agg = c.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__ca") * F.col("__cb")).alias("__sab"),
        F.sum(F.col("__ca") * F.col("__ca")).alias("__saa"),
        F.sum(F.col("__cb") * F.col("__cb")).alias("__sbb"),
    )
    rho = F.col("__sab").cast("double") / (
        F.sqrt(F.col("__saa").cast("double")) * F.sqrt(F.col("__sbb").cast("double"))
    )
    return agg.select(
        "grp",
        "n",
        F.round(
            F.when((F.col("__saa") > 0) & (F.col("__sbb") > 0), rho), 6
        ).alias("spearman_rho"),
    )


def kruskal_wallis(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Kruskal–Wallis H test (rank one-way ANOVA): do the distributions of
    ``value_col`` differ across groups, without normality assumptions?
    Ranks are global (one sort), tie-averaged via the doubled-rank trick
    (2·avg_rank is an integer), group rank-sums are exact longs, and the
    tie-correction Σ(t³−t)/(n³−n) is an exact long fold — the only doubles
    are the closed-form H at the end.  Squaring the doubled rank-sum is
    done in DOUBLE (values < 2⁵³ for n < ~3·10⁶) to dodge int64 overflow.

    Scale: the global rank window is the cost — at 100 TB replace with
    range-partitioned ranking (sampled splits + per-partition offsets)."""
    wv = W.orderBy(F.col(value_col).asc())
    tv = W.partitionBy(value_col)
    r = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("__v"),
        (2 * F.rank().over(wv) + F.count(F.lit(1)).over(tv) - 1).cast("long").alias("__r2"),
    )
    gsum = r.groupBy("grp").agg(
        F.count(F.lit(1)).alias("__ng"), F.sum("__r2").alias("__rs2")
    )
    ties = (
        df.groupBy(F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__t"))
        .agg(F.sum(F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")).alias("__tie"))
    )
    tot = gsum.agg(F.sum("__ng").alias("__n"), F.count(F.lit(1)).alias("__k"))
    # per-group H contribution, folded in fixed point so the k-row sum is
    # order-free: 12·(R2_g)²/(4·n_g·n·(n+1)) with R2_g = doubled rank-sum
    j = gsum.crossJoin(F.broadcast(tot))
    nd = F.col("__n").cast("double")
    term = (
        12.0
        * F.col("__rs2").cast("double")
        * F.col("__rs2").cast("double")
        / (4.0 * F.col("__ng").cast("double") * nd * (nd + 1.0))
    )
    red = (
        j.agg(
            F.max("__n").cast("long").alias("n"),
            F.max("__k").cast("long").alias("k"),
            dsum(term).alias("__hsum"),
        )
        .crossJoin(F.broadcast(ties))
    )
    n = F.col("n").cast("double")
    h = F.col("__hsum") - 3.0 * (n + 1.0)
    corr = 1.0 - F.col("__tie").cast("double") / (n * n * n - n)
    return red.select(
        "n",
        "k",
        F.round(h, 6).alias("h_stat"),
        F.round(h / corr, 6).alias("h_corrected"),
        (h / corr > 9.488).cast("int").alias("flag_reject"),
    )


def cramers_v(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Cramér's V association strength for two categoricals: the [0,1]
    rescaling of the chi-squared statistic (V = √(χ²/(n·(min(r,c)−1)))) —
    the effect-size companion to q_chi2's significance screen, same
    contingency scan, zero cells restored so expected counts are honest."""
    cells = df.groupBy(
        F.col(col_x).alias("__x"), F.col(col_y).alias("__y")
    ).agg(F.count(F.lit(1)).alias("__nxy"))
    xt = cells.groupBy("__x").agg(F.sum("__nxy").alias("__nx"))
    yt = cells.groupBy("__y").agg(F.sum("__nxy").alias("__ny"))
    nn = cells.agg(
        F.sum("__nxy").alias("__n"),
        F.countDistinct("__x").alias("__dx"),
        F.countDistinct("__y").alias("__dy"),
    )
    j = (
        xt.crossJoin(F.broadcast(yt))
        .join(cells, ["__x", "__y"], "left")
        .withColumn("__nxy", F.coalesce("__nxy", F.lit(0)))
        .crossJoin(F.broadcast(nn))
    )
    exp = F.col("__nx").cast("double") * F.col("__ny") / F.col("__n")
    term = (F.col("__nxy").cast("double") - exp) * (F.col("__nxy") - exp) / exp
    red = j.agg(
        F.max("__n").cast("long").alias("n"),
        F.least(F.max("__dx"), F.max("__dy")).cast("long").alias("min_dim"),
        F.round(dsum(term), 6).alias("chi2"),
    )
    return red.select(
        "n",
        "chi2",
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n").cast("double") * (F.col("min_dim") - 1).cast("double"))
            ),
            6,
        ).alias("cramers_v"),
    )


def brown_forsythe(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Brown–Forsythe test (Levene with group medians): are the group
    VARIANCES equal?  z = |x − median(group)| rounded to 1e-6, then the
    one-way ANOVA F on z — the variance-homogeneity gate you run before
    trusting a pooled-variance t test / ANOVA.  The per-group median is a
    broadcast k-row relation; both engines interpolate the even-n median
    identically in double."""
    med = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.median(value_col).alias("__med")
    )
    z = (
        df.join(F.broadcast(med), df[group_col] == med["grp"])
        .select(
            F.col("grp"),
            F.round(F.abs(F.col(value_col) - F.col("__med")), 6).alias("__z"),
        )
    )
    return anova_oneway(z, "__z", "grp")


def anova_twoway(df: DataFrame, value_col: str, factor_a: str, factor_b: str) -> DataFrame:
    """Two-way ANOVA with interaction from ONE cell-level moment pass:
    SS_A / SS_B / SS_AB / SS_within for value ~ A + B + A:B, F for each
    effect against the within mean square — does the priority effect
    DEPEND on the status (the question two one-way passes can't ask).
    Unbalanced cells use the textbook unweighted decomposition
    (SS_AB = SS_cells − SS_A − SS_B), the standard screening convention.

    Exactness: cell sums are fixed-point; every marginal fold re-rounds
    to 1e-6 before summing (k-row folds over ≤ a·b rows), so the table
    hash-matches a single-threaded oracle. One shuffle on (A, B)."""
    cells = df.groupBy(
        F.col(factor_a).alias("fa"), F.col(factor_b).alias("fb")
    ).agg(
        F.count(F.lit(1)).alias("n_ab"),
        dsum(value_col).alias("s_ab"),
        dsum(F.col(value_col) * F.col(value_col)).alias("ss_ab"),
    )
    fsum = lambda c: (F.sum(F.round(F.col(c) * 1000000).cast("long")).cast("double") / 1000000)
    tot = cells.agg(
        F.sum("n_ab").alias("n"),
        fsum("s_ab").alias("s"),
        fsum("ss_ab").alias("ssq"),
        F.countDistinct("fa").alias("ka"),
        F.countDistinct("fb").alias("kb"),
    )
    ma = cells.groupBy("fa").agg(F.sum("n_ab").alias("n_a"), fsum("s_ab").alias("s_a"))
    mb = cells.groupBy("fb").agg(F.sum("n_ab").alias("n_b"), fsum("s_ab").alias("s_b"))
    grand = F.col("s") / F.col("n").cast("double")
    ssa = (
        ma.crossJoin(F.broadcast(tot))
        .select(
            (F.col("n_a").cast("double")
             * (F.col("s_a") / F.col("n_a") - grand)
             * (F.col("s_a") / F.col("n_a") - grand)).alias("t")
        )
        .agg(dsum("t").alias("ss_a"))
    )
    ssb = (
        mb.crossJoin(F.broadcast(tot))
        .select(
            (F.col("n_b").cast("double")
             * (F.col("s_b") / F.col("n_b") - grand)
             * (F.col("s_b") / F.col("n_b") - grand)).alias("t")
        )
        .agg(dsum("t").alias("ss_b"))
    )
    sscells = (
        cells.crossJoin(F.broadcast(tot))
        .select(
            (F.col("n_ab").cast("double")
             * (F.col("s_ab") / F.col("n_ab") - grand)
             * (F.col("s_ab") / F.col("n_ab") - grand)).alias("t")
        )
        .agg(dsum("t").alias("ss_cells"))
    )
    j = (
        tot.crossJoin(F.broadcast(ssa))
        .crossJoin(F.broadcast(ssb))
        .crossJoin(F.broadcast(sscells))
    )
    sst = F.col("ssq") - F.col("s") * F.col("s") / F.col("n").cast("double")
    ss_ab_i = F.col("ss_cells") - F.col("ss_a") - F.col("ss_b")
    ssw = sst - F.col("ss_cells")
    df_a = (F.col("ka") - 1).cast("double")
    df_b = (F.col("kb") - 1).cast("double")
    df_i = df_a * df_b
    df_w = (F.col("n") - F.col("ka") * F.col("kb")).cast("double")
    msw = ssw / df_w
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("ka").cast("long").alias("levels_a"),
        F.col("kb").cast("long").alias("levels_b"),
        F.round("ss_a", 6).alias("ss_a"),
        F.round("ss_b", 6).alias("ss_b"),
        F.round(ss_ab_i, 6).alias("ss_interaction"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(F.col("ss_a") / df_a / msw, 6).alias("f_a"),
        F.round(F.col("ss_b") / df_b / msw, 6).alias("f_b"),
        F.round(ss_ab_i / df_i / msw, 6).alias("f_interaction"),
    )


def tukey_hsd(df: DataFrame, value_col: str, group_col: str, q_crit: float = 3.86) -> DataFrame:
    """Tukey-Kramer post-hoc pairwise comparisons after a one-way ANOVA:
    every group pair's mean difference and studentized-range statistic
    |Δ| / √(MSW/2 · (1/nᵢ + 1/nⱼ)), flagged at the literal critical value
    (default 3.86 ≈ q₀.₀₅ for 5 groups, large df) — WHICH means differ,
    where q_anova only says SOME do. Group relation is k rows; the pair
    join is k², driver-free."""
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("ng"),
        dsum(value_col).alias("sg"),
        dsum(F.col(value_col) * F.col(value_col)).alias("ssg"),
    )
    fsum = lambda c: (F.sum(F.round(F.col(c) * 1000000).cast("long")).cast("double") / 1000000)
    tot = g.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        fsum("ssg").alias("ssq_t"),
    )
    within = (
        g.select(
            (F.col("ssg") - F.col("sg") * F.col("sg") / F.col("ng").cast("double")).alias("t")
        )
        .agg(dsum("t").alias("ssw"))
    )
    msw_rel = tot.crossJoin(F.broadcast(within)).select(
        "n", "k",
        (F.col("ssw") / (F.col("n") - F.col("k")).cast("double")).alias("msw"),
    )
    a = g.select(F.col("grp").alias("grp_a"), F.col("ng").alias("na"), (F.col("sg") / F.col("ng").cast("double")).alias("m_a"))
    b = g.select(F.col("grp").alias("grp_b"), F.col("ng").alias("nb"), (F.col("sg") / F.col("ng").cast("double")).alias("m_b"))
    pairs = a.crossJoin(b).where(F.col("grp_a") < F.col("grp_b")).crossJoin(
        F.broadcast(msw_rel)
    )
    diff = F.col("m_a") - F.col("m_b")
    se = F.sqrt(
        F.col("msw") / 2.0 * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    qstat = F.abs(diff) / se
    return pairs.select(
        "grp_a",
        "grp_b",
        F.round(diff, 6).alias("mean_diff"),
        F.round(qstat, 6).alias("q_stat"),
        F.when(qstat > F.lit(float(q_crit)), 1).otherwise(0).cast("int").alias("significant"),
    ).orderBy("grp_a", "grp_b")
