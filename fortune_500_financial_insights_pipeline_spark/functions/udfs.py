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
