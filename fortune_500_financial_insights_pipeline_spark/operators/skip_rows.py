"""Skip-first-N-rows without a single-partition global window.

The reference implements "skip the 4 metadata rows of a yfinance CSV" as
``row_number().over(Window.orderBy(lit(1))) > 4``
(/root/reference/code/spark-jobs/raw_to_landing_sparkjob.py:85-89), which
funnels the entire file through ONE partition — a non-starter at scale.

Two scalable replacements:

* ``skip_rows(df, order_col, n)`` — when a total-order key exists: find the
  n-th smallest key with a TakeOrdered (driver receives n rows, executors do
  a parallel partial top-n) and filter ``key > threshold``. No shuffle at
  all; the filter pushes down to the scan.
* ``skip_rows_per_file(df, n)`` — for file-ordered data with no key: tag each
  row with its within-file position using ``input_file_name`` +
  ``monotonically_increasing_id`` ordering per file via a window partitioned
  BY FILE (parallel across files, which is the real unit of work for
  "skip CSV header garbage").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


MAX_SKIP_ROWS = 100_000  # the threshold scan collects n rows to the driver


def skip_rows(df: DataFrame, order_col: str, n: int) -> DataFrame:
    """Drop the n rows with the smallest ``order_col`` (must be unique).

    ``n`` must stay small (≤ ``MAX_SKIP_ROWS``): the threshold is found with
    a TakeOrdered that materializes n rows on the driver. The operator exists
    for metadata-row skips (n≈4); for dropping a large prefix, filter on the
    key range instead."""
    if n <= 0:
        return df
    if n > MAX_SKIP_ROWS:
        raise ValueError(
            f"skip_rows collects n={n} rows to the driver; cap is "
            f"{MAX_SKIP_ROWS}. Filter on the key range instead."
        )
    head = df.select(order_col).orderBy(order_col).limit(n).collect()
    if len(head) < n:
        return df.limit(0)
    threshold = head[-1][0]
    return df.filter(F.col(order_col) > F.lit(threshold))


def skip_rows_per_file(df: DataFrame, n: int) -> DataFrame:
    """Drop the first n rows of each input file (CSV metadata-row skip).

    Partitioning the window by file keeps every file's rows independent —
    1000 files = 1000 parallel window partitions, vs. the reference's single
    global partition. ``monotonically_increasing_id`` is ordered within a
    Spark partition, and Spark reads a (small) CSV file as one partition, so
    it reproduces file order; for large splittable files use the keyed
    variant instead.
    """
    tagged = df.withColumn("_file", F.input_file_name()).withColumn(
        "_pos", F.monotonically_increasing_id()
    )
    w = W.partitionBy("_file").orderBy("_pos")
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > n)
        .drop("_file", "_pos", "_rn")
    )
