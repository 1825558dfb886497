"""Deduplication operators: exact, keep-latest, and fingerprint-based.

The reference's Kaggle∪API union leaves (Ticker, Date) duplicates that its
own DDL forbids (UNIQUE(Ticker, Date), /root/reference/code/sql/DDLs:14;
union at code/spark-jobs/raw_to_landing_sparkjob.py:131-134). These operators
provide the dedup the schema intends, scaled: everything is a hash-partitioned
window or groupBy on the dedup key — no global ordering, no driver loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal on a column subset (hash groupBy underneath)."""
    return df.dropDuplicates(list(cols) if cols else None)


def keep_latest(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """One row per key, the max of ``order_cols`` (lexicographic) winning.

    row_number over (partitionBy keys, orderBy order_cols DESC) == 1.
    The shuffle is on the dedup key only; with AQE skew-join handling a hot
    key splits automatically.
    """
    w = W.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def strip_duplicate_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-granularity dedup REMOVAL (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022): segment each
    document into disjoint ``chunk_words``-word chunks, drop every chunk
    whose content appears in >= ``min_docs`` distinct documents, and
    reassemble the surviving chunks in order.  Detection alone is
    ``text.duplicated_spans`` (q_dup_spans); this is the edit step that
    actually produces the cleaned corpus.

    Returns (id, clean_text, n_chunks, n_kept).  Docs whose every chunk is
    corpus-duplicated survive with clean_text = '' (the caller's quality
    gate drops empties) — silently losing the row would break joins keyed
    on the id downstream.

    Scale shape: the only wide ops are a groupBy on the 128-bit chunk hash
    (uniform — no skew regardless of text skew) and a groupBy on the doc id
    to reassemble.  Chunk text never rides the hash shuffle: the dup-hash
    side reduces to (hash, n_docs) before the anti-join back.  Fixed
    chunking (not sliding windows) keeps the exploded volume at 1x corpus.
    """
    from fortune_500_financial_insights_pipeline_spark.operators.text import _bind

    toks = F.split(F.col(text_col), " ")
    nchunks = F.ceil(F.size(toks) / F.lit(chunk_words)).cast("int")
    # Build the chunk array once per doc, then posexplode — the naive
    # explode(sequence)-then-slice form duplicates the full token array
    # into every chunk row (O(chunks x doc_len) intermediate volume).
    # The token array is lambda-bound (text._bind) so the tokenizer split
    # runs once per row, not once per chunk slice.
    chunk_arr = _bind(
        toks,
        lambda tk: F.transform(
            F.sequence(F.lit(0), F.ceil(F.size(tk) / F.lit(chunk_words)).cast("int") - 1),
            lambda c: F.array_join(F.slice(tk, c * chunk_words + 1, chunk_words), " "),
        ),
    )
    chunks = df.select(
        F.col(id_col), F.posexplode(chunk_arr).alias("cid", "ctext")
    )
    hashed = chunks.withColumn("h", F.md5("ctext"))
    dup = (
        hashed.groupBy("h")
        .agg(F.countDistinct(id_col).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("h")
    )
    kept = hashed.join(dup, "h", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cid", "ctext"))),
                lambda s: s["ctext"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(id_col, nchunks.cast("long").alias("n_chunks"))
    return totals.join(reassembled, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def fingerprint_dedup(
    df: DataFrame, text_col: str, id_col: str, normalize: bool = True
) -> DataFrame:
    """Content-hash dedup: md5 of (optionally whitespace/case-normalized)
    text, keeping the smallest id per fingerprint. The md5 is computed
    map-side; the shuffle key is the 128-bit digest, which is uniformly
    distributed — no skew even when the raw text length distribution is
    skewed."""
    norm = F.col(text_col)
    if normalize:
        norm = F.trim(F.regexp_replace(F.lower(norm), r"\s+", " "))
    fp = F.md5(norm)
    w = W.partitionBy("_fp").orderBy(F.asc(id_col))
    return (
        df.withColumn("_fp", fp)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumnRenamed("_fp", "fingerprint")
    )
