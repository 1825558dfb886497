"""Count-min sketch as a relational, engine-portable table of bucket counts.

Spark's built-in ``count_min_sketch`` aggregate emits an opaque binary blob —
useless for cross-engine verification and awkward to merge outside the JVM.
This formulation keeps the sketch AS A TABLE: ``(row i, bucket b) → count``,
which makes the three sketch operations plain relational algebra:

* **build** — d hash rows per input row (an explode), then a (i, b) groupBy
  that partial-aggregates map-side: the shuffle carries at most d·w cells,
  never input rows. At 100 TB this is the sketch property that matters —
  the reduction to d·w cells happens before the exchange, and the cell
  table is tiny regardless of input size.
* **merge** — cell-wise sum of two sketch tables (union + re-groupBy); used
  for combining per-partition / per-day sketches. Exact: counts are longs.
* **estimate** — join candidate items to their d cells, take min(count):
  the classic CMS upper bound (est ≥ true, over-count bounded by collisions).

Hashing is the md5 trick from operators/sampling.py taken one step further:
the first two hex chars of ``md5(seed_i || '|' || value)`` give an exactly
uniform bucket in [0, 256) via positional digit arithmetic — every function
involved (md5, substring, instr) evaluates identically in Spark and DuckDB,
so the full build→estimate pipeline is DuckDB-oracle-checkable (q_cms_heavy),
something no binary-sketch implementation can offer.

Width/depth tradeoff is standard CMS: w=256, d=4 → overestimate ≤ e·N/w with
probability 1 - e^-d per query. For heavy hitters over a few thousand keys
that bounds the error well under typical gaps between true heavy counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHA = "0123456789abcdef"
WIDTH = 256  # buckets per hash row: two hex digits exactly
DEPTH = 4


def _bucket_sql(value_sql: str, i: int) -> str:
    """The bucket expression as engine-shared SQL text (valid in both Spark
    SQL and DuckDB): digit(h[0])*16 + digit(h[1])."""
    h = f"md5(concat('{i}|', CAST({value_sql} AS STRING)))"
    d = lambda pos: f"(instr('{ALPHA}', substring({h}, {pos}, 1)) - 1)"  # noqa: E731
    return f"({d(1)} * 16 + {d(2)})"


def cms_pairs(df: DataFrame, value_col: str, depth: int = DEPTH) -> DataFrame:
    """The d (i, b) cell coordinates per input row — the pre-aggregation
    form shared by batch build and streaming maintenance."""
    return df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.expr(_bucket_sql(value_col, i)).cast("int").alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("hb")
    ).select("hb.i", "hb.b")


def cms_build(df: DataFrame, value_col: str, depth: int = DEPTH) -> DataFrame:
    """Sketch table (i, b, cnt) for the values in ``value_col``."""
    return cms_pairs(df, value_col, depth).groupBy("i", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def streaming_cms(stream: DataFrame, value_col: str, depth: int = DEPTH) -> DataFrame:
    """CMS over an unbounded stream: the sketch IS a streaming aggregate —
    the state store holds at most d·w cells no matter how long the stream
    runs (complete/update output mode; no watermark needed because the
    state is bounded by construction, not by time)."""
    return cms_pairs(stream, value_col, depth).groupBy("i", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Exact sketch union: cell-wise sum."""
    return (
        a.unionByName(b)
        .groupBy("i", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, items: DataFrame, value_col: str, depth: int = DEPTH
) -> DataFrame:
    """min-over-rows point estimates for each item in ``items`` (carries all
    other columns of ``items`` through). The sketch side is d·w rows —
    broadcast it; the item side stays partitioned."""
    cells = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.expr(_bucket_sql(value_col, i)).cast("int").alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("hb"),
    ).select(*items.columns, "hb.i", "hb.b")
    carry = [c for c in items.columns]
    # LEFT join + coalesce(0): a hash row landing in an absent (zero-count)
    # cell must contribute 0 to the min, and an item whose d cells are all
    # absent must estimate 0 — an inner join would drop both.
    return (
        cells.join(F.broadcast(cms), ["i", "b"], "left")
        .groupBy(*carry)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )
