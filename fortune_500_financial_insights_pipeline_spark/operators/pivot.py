"""Long↔wide reshaping: the statement-transpose capability.

The reference transposes financial statements driver-side in pandas
(``df.T`` + first-row-as-header, /root/reference/code/scripts/
transform_job_tabular_entitities.py:21-24) — zero executor parallelism. The
Spark-native form is a grouped pivot: ``groupBy(period).pivot(line_item,
values).agg(first(value))``, which distributes by group key.

Always pass explicit ``values``: it pins output column order (oracle/schema
stability) and skips the extra distinct-collect job Spark otherwise runs to
discover pivot values — at 100 TB that discovery pass is a full scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
    prefix: str = "",
) -> DataFrame:
    """groupBy(group_cols).pivot(pivot_col, values).agg(agg), with stable
    ``{prefix}{value}`` output column names."""
    out = df.groupBy(*group_cols).pivot(pivot_col, list(values)).agg(agg)
    if prefix:
        for v in values:
            out = out.withColumnRenamed(str(v), f"{prefix}{v}")
    return out


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "name",
    value_name: str = "value",
) -> DataFrame:
    """Inverse reshape via the native unpivot (melt) operator."""
    return df.unpivot(list(id_cols), list(value_cols), var_name, value_name)
