"""Z-order (Morton) clustering for multi-dimensional data skipping.

A table sorted by one column prunes parquet files/row-groups on that
column only — a filter on any other column reads everything. Interleaving
the bits of two (or more) normalized sort keys gives every file a tight
min/max envelope on EVERY interleaved dimension, so predicate-on-any-dim
skips most files. OSS Spark has no native Z-order (it's a Delta/Iceberg
table-service feature); this builds the z-value as a pure JVM expression
column — shiftleft/and/or over normalized fixed-point ranks — and lets
`repartitionByRange(z).sortWithinPartitions(z)` produce the layout.
Statistics-based skipping then happens in any parquet reader, Spark's
included, with no table-format dependency.

Normalization uses global min/max collected in ONE tiny aggregate
(broadcast literal, not a driver loop); rank-based normalization (ntile)
would handle skew better but costs a full sort — min/max is the right
default for roughly-uniform numeric keys.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton-interleave n already-normalized integer columns: output bit
    (i*n + j) = bit i of column j. Pure long arithmetic — codegen-friendly."""
    n = len(cols)
    terms = [
        F.shiftleft(
            F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
        )
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "__z",
) -> DataFrame:
    """Attach a z-value column interleaving ``cols`` (numeric).

    ``bits`` per dimension; n_dims * bits must stay < 63. Min/max for the
    normalization are computed in one aggregate and inlined as literals.
    """
    if len(cols) * bits >= 63:
        raise ValueError("n_dims * bits must fit a signed long")
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).head()
    top = (1 << bits) - 1
    normed = []
    for c in cols:
        mn = float(stats[f"mn_{c}"])
        mx = float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        normed.append(
            F.least(
                F.lit(top),
                ((F.col(c) - mn) / span * top).cast("long"),
            )
        )
    return df.withColumn(out_col, _interleave(normed, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Land ``df`` as ``n_files`` parquet files clustered in z-order on
    ``cols``: range-partition by z (each file owns a z-interval → a tight
    hyper-rectangle), sort within files so row-group stats are tight too,
    drop the helper column at write."""
    z = with_zvalue(df, cols, bits=bits)
    (
        z.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
