"""Shared query-registry core: the QUERIES dict, the @q decorator, and
cross-domain helpers (trained-artifact memo, shared scoring frames).
Split out of the former single-file queries.py in round 3; the public
import path `fortune_500_financial_insights_pipeline_spark.queries` is unchanged
(see __init__.py)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg, dsum, dsum_w


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

def q(name: str):
    def deco(fn):
        QUERIES[name] = fn
        return fn

    return deco

# Deterministic trained-artifact memo. kmeans/PQ training is
# bit-deterministic given (table, params) — the same fixture tables
# re-yield the identical centroids/codebooks on every call — so the five
# ANN-family keys retraining the same quantizer inside one process only
# re-pay identical Spark jobs. Values are plain Python lists/dicts (no
# Spark handles, so they survive session restarts); keyed by
# (artifact, sf_dir, params). A driver that imports a fresh process per
# query sees a cold memo and simply retrains — results are identical
# either way. Production analogue: an ANN index is trained once at build
# time and shared by every query, not retrained per request.
_TRAINED_MEMO: dict[tuple, object] = {}

def _memo_trained(key: tuple, build: Callable[[], object]):
    if key not in _TRAINED_MEMO:
        _TRAINED_MEMO[key] = build()
    return _TRAINED_MEMO[key]

def _qvec_probe(emb: DataFrame, centroids, n_probe: int = 2):
    """(query vector, probed cells) for vec_id=0 in ONE head() job —
    routing through the same Spark round-6 expression the oracle mirrors
    (python round() is banker's — not a safe stand-in)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import probe_cells_col

    row = (
        emb.filter(F.col("vec_id") == 0)
        .select(
            "embedding",
            probe_cells_col("embedding", centroids, n_probe).alias("p"),
        )
        .head()
    )
    return list(row["embedding"]), list(row["p"])

def _scored_labeled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier probs (q_classifier_score's exact model) joined with the
    binary is-English label — the shared eval frame for AUC/calibration."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import classifier_score

    d = load_table(spark, sf_dir, "documents")
    weights = spark.range(256).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.col("id") % 21) * 50 - 500).cast("long").alias("w_fp"),
    )
    scored = classifier_score(d, weights)
    return scored.join(
        d.select("doc_id", (F.col("lang") == "en").cast("long").alias("label")),
        "doc_id",
    )
