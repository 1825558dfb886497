"""Arrow-vectorized pandas UDFs (SURVEY.md §2.9): the scalar and
grouped-aggregate escape hatches, batch-at-a-time over Arrow transfers.

NOTE: no ``from __future__ import annotations`` here — pandas_udf resolves
the real type hints at definition time to infer the UDF kind (scalar vs
grouped-agg); stringified annotations break that introspection.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def norm_name(s: pd.Series) -> pd.Series:
    """Scalar pandas UDF: vectorized string normalization (trim, lower,
    whitespace collapse) — one Arrow batch per call, no per-row Python."""
    return s.str.strip().str.lower().str.replace(r"\s+", " ", regex=True)


@pandas_udf("double")
def wmean(price: pd.Series, qty: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: weighted mean (rounded so vectorized
    float summation order matches the SQL oracle)."""
    return float(round((price * qty).sum() / qty.sum(), 6))


def make_nearest_cell_udf(centroids):
    """Factory: pandas UDF assigning each embedding to its nearest centroid
    by cosine (numpy matmul over the Arrow batch). Interpreted higher-order
    array functions cost ~µs per element-lambda; for k×dim dot products per
    row that's the slow path — vectorized BLAS is 50-100x faster."""
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)
    c_norm = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)

    @pandas_udf("int")
    def nearest_cell(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        m_norm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m_norm @ c_norm.T, axis=1).astype("int32"))

    return nearest_cell


# The series-level implementations live in functions/textclean.py (a
# Spark-free module) so mapInPandas bodies can import them worker-side:
# importing THIS module in an executor worker would re-run the pandas_udf
# decorators and die with SESSION_OR_CONTEXT_NOT_EXISTS.
from fortune_500_financial_insights_pipeline_spark.functions.textclean import (  # noqa: E402
    nfc_normalize_series,
    strip_accents_series,
)


@pandas_udf("string")
def nfc_normalize(s: pd.Series) -> pd.Series:
    """Unicode NFC normalization (UAX #15), Arrow-vectorized — the first
    cleaning pass of any multilingual corpus build: decomposed sequences
    (e + U+0301) collapse to their canonical precomposed forms so exact
    dedup, hashing, and tokenization see one spelling. Matches DuckDB's
    ``nfc_normalize`` (both implement the Unicode standard), which is
    what lets q_unicode_clean hash-certify it cross-engine. Pure-ASCII
    rows skip the per-element normalize entirely (identity under NFC)."""
    return nfc_normalize_series(s)


@pandas_udf("string")
def strip_accents(s: pd.Series) -> pd.Series:
    """Accent folding: NFD-decompose, drop combining diacritical marks
    (U+0300–U+036F) — the aggressive fold used for fuzzy matching and
    search keys. Semantics match DuckDB's ``strip_accents``. Pure-ASCII
    rows skip the per-element decompose (identity under NFD, no marks)."""
    return strip_accents_series(s)
