"""Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003) —
the MOSS algorithm: from the stream of k-gram hashes, keep the minimum of
every w-wide window (rightmost on ties). Guarantees: any shared substring
of length >= w+k-1 yields at least one shared selected fingerprint, and
the selected density is ~2/(w+1) — position-robust local dedup signatures
at a fraction of full-shingle cost.

Relational form: gram hashes with positions (one positioned explode, the
only volume-carrying stage), per-start window minima via a frame-bounded
MIN (never a global sort), and the rightmost-argmin selection as an
equi-join of starts back to grams on (doc, hash) + a range refinement —
no per-row iteration, no UDF. The md5-derived gram hash is engine-portable
(same integer in any SQL engine), so the whole selection is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def winnow_fingerprints(
    docs: DataFrame,
    *,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Selected fingerprints per document: (id, pos, fp) where ``pos`` is
    the gram's 0-based word offset and ``fp`` the 60-bit md5-derived gram
    hash. A gram is selected iff it is the minimum of some w-window of
    consecutive gram hashes, taking the RIGHTMOST position on ties (the
    paper's robust-winnowing rule, which makes the selection depend only
    on window content, not scan history). Documents with fewer than
    ``w + k - 1`` words have no full window and select nothing."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    src = ensure_min_parallelism(
        docs.select(F.col(id_col), F.col(text_col).alias("__t")), id_col
    )
    toks = F.split(F.col("__t"), " ")
    gram_hashes = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ",
                        *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)],
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
    )
    grams = src.where(F.size(toks) >= k).select(
        id_col,
        F.posexplode(gram_hashes).alias("pos", "h"),
        (F.size(toks) - k + 1).alias("n_grams"),
    )

    # Window minimum per start position (frame = the w grams from here).
    # Starts past n_grams - w have a short frame and are not real windows.
    frame = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    starts = (
        grams.withColumn("wmin", F.min("h").over(frame))
        .where(F.col("pos") <= F.col("n_grams") - w)
        .select(F.col(id_col), F.col("pos").alias("s"), "wmin")
    )

    # Rightmost argmin: rejoin each start to its window's grams carrying the
    # minimum hash — an equi-join on (doc, hash) with a w-wide positional
    # refinement, then MAX(pos) per start. DISTINCT collapses grams selected
    # by several overlapping windows (winnowing reports a set).
    ga = grams.select(
        F.col(id_col).alias("_gid"), F.col("pos").alias("gpos"), "h"
    )
    sel = (
        starts.join(
            ga,
            (F.col(id_col) == F.col("_gid"))
            & (F.col("h") == F.col("wmin"))
            & (F.col("gpos") >= F.col("s"))
            & (F.col("gpos") <= F.col("s") + (w - 1)),
        )
        .groupBy(id_col, "s", "wmin")
        .agg(F.max("gpos").alias("pos"))
    )
    return sel.select(F.col(id_col), "pos", F.col("wmin").alias("fp")).distinct()
