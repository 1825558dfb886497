"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): pick pretraining documents from a raw pool whose hashed-n-gram
distribution looks like a target domain. The standard recipe behind
"make CommonCrawl look like Wikipedia":

1. featurize every document as hashed bigram counts over B buckets;
2. fit smoothed bag-of-buckets models on the TARGET corpus (p) and the
   RAW pool (q);
3. score each raw document with the importance log-weight
   Σ_b c_b(doc) · (ln p_b − ln q_b);
4. keep the top-quota by weight.

Everything is relational: two corpus-level bucket aggregations (B rows
each — broadcastable constants), one per-doc bucket aggregation, a
bucket equi-join, and a fixed-point per-doc sum. The md5-derived bucket
hash is engine-portable and the per-bucket log term is a single IEEE
expression over exact integer counts, so scores are oracle-exact.

Scale shape: the only corpus-sized stages are the gram explode and the
per-doc groupBy; model tables are B rows and join broadcast. Nothing is
collected; the quota cut is a TakeOrdered/WindowGroupLimit."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucketed_bigrams(df: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    """(id, bucket) with multiplicity — hashed-bigram features."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import _bind

    toks = F.split(F.lower(F.col(text_col)), " ")
    # token array lambda-bound (text._bind): the lower+split runs once per
    # row instead of twice per gram element
    grams = _bind(
        toks,
        lambda tk: F.transform(
            F.sequence(F.lit(0), F.size(tk) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(tk, (i + 1).cast("int")),
                F.element_at(tk, (i + 2).cast("int")),
            ),
        ),
    )
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10).cast("long")
    return (
        df.where(F.size(toks) >= 2)
        .select(F.col(id_col), F.explode(grams).alias("gram"))
        .select(F.col(id_col), F.pmod(h, F.lit(n_buckets)).alias("bucket"))
    )


def dsir_logweights(
    candidates: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    alpha: float = 0.5,
) -> DataFrame:
    """Importance log-weight per candidate document: how much more likely
    its hashed-bigram bag is under the target model than under the raw
    pool's own model. Add-α smoothing keeps absent buckets finite; the
    raw-side model is fit on the candidates themselves (the paper's q).

    Returns (id, logw round-6, n_feats). Rank/threshold downstream."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum

    cb = _bucketed_bigrams(candidates, id_col, text_col, n_buckets)
    tb = _bucketed_bigrams(target, id_col, text_col, n_buckets)

    doc_b = cb.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("c"))
    q_model = doc_b.groupBy("bucket").agg(F.sum("c").alias("cq"))
    p_model = tb.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    q_total = q_model.agg(F.sum("cq").alias("qt"))
    p_total = p_model.agg(F.sum("ct").alias("pt"))

    denom = float(alpha) * n_buckets
    # Candidate buckets can be absent from the target model: LEFT join +
    # count 0, so the smoothing term (not a dropped row) carries them.
    joined = (
        doc_b.join(q_model, "bucket")
        .join(F.broadcast(p_model), "bucket", "left")
        .crossJoin(F.broadcast(q_total))
        .crossJoin(F.broadcast(p_total))
        .withColumn("ct", F.coalesce("ct", F.lit(0)))
    )
    logterm = F.log(
        (F.col("ct") + F.lit(float(alpha))) / (F.col("pt") + F.lit(denom))
    ) - F.log((F.col("cq") + F.lit(float(alpha))) / (F.col("qt") + F.lit(denom)))
    return joined.groupBy(id_col).agg(
        F.round(dsum(F.col("c") * logterm), 6).alias("logw"),
        F.sum("c").cast("long").alias("n_feats"),
    )
