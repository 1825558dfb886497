"""Document chunking: fixed-size token windows with overlap — the 1→N
row expansion every training-data pipeline runs before tokenization
(SURVEY.md §2.11; no counterpart in the reference, which never touches
document text).

All JVM-side: split → sequence of window starts → posexplode → slice.
No UDF, no shuffle — the operator is embarrassingly parallel and its
output partitioning follows the input's, so a downstream groupBy(doc_id)
still needs only one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode each document into overlapping windows of `chunk_tokens`
    whitespace tokens, stepping by `chunk_tokens - overlap`.

    Returns (doc_id, *keep_cols, chunk_index, chunk_start, n_tokens,
    chunk_text); the final window may be shorter than `chunk_tokens`
    (never empty). `keep_cols` carries metadata columns (lang, source, …)
    through the expansion unchanged.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    keep = [F.col(c) for c in (keep_cols or [])]
    toks = F.split(F.col(text_col), " ")
    # stage the token array once: slice() references it per window, and an
    # inlined split() would be re-evaluated for every chunk (SCALE.md
    # "Expression staging")
    staged = docs.select(F.col(id_col), *keep, toks.alias("__toks"))
    starts = F.sequence(F.lit(0), F.size("__toks") - 1, F.lit(step))
    exploded = staged.select(
        F.col(id_col),
        *keep,
        F.col("__toks"),
        F.posexplode(starts).alias("chunk_index", "chunk_start"),
    )
    window = F.slice(F.col("__toks"), F.col("chunk_start") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        *keep,
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(window).cast("long").alias("n_tokens"),
        F.concat_ws(" ", window).alias("chunk_text"),
    )


def cdc_chunks(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    divisor: int = 16,
    keep_text: bool = False,
) -> DataFrame:
    """Content-defined chunking: chunk boundaries fall AFTER any token
    whose k-token rolling window hash is ≡ 0 (mod ``divisor``) — the
    storage-dedup/chunk-dedup boundary rule (Muthitacharoen et al., "A
    Low-Bandwidth Network File System", SOSP 2001; gear/Rabin CDC family).
    Unlike fixed windows (``chunk_documents``), an insertion early in a
    document shifts only the chunk it lands in — downstream chunk hashes
    stay stable, which is what makes chunk-level dedup survive edits.

    Expected chunk length = ``divisor`` tokens. The window hash is the
    engine-portable md5-long over the last k tokens (position gated:
    the first k-1 tokens never bound), boundary flags turn into chunk ids
    with one gaps-islands cumulative window, and per-chunk rows collapse
    in one groupBy: (doc, chunk_id, chunk_start, n_tokens, chunk_hash)
    with chunk_hash = md5 of the position-ordered chunk text.

    Scale shape: one positioned explode, ONE window family (per-doc by
    position: lags + cumulative sum share the sort), one partial-agged
    groupBy — text rides no shuffle except the final chunk-sized rows."""
    from pyspark.sql import Window as W

    src = docs.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    )
    wo = W.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(
        " ", *[F.lag("tok", k - 1 - j).over(wo) for j in range(k - 1)], F.col("tok")
    )
    h = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    bnd = F.when(
        (F.col("pos") >= k - 1) & (F.pmod(h, F.lit(divisor)) == 0), F.lit(1)
    ).otherwise(F.lit(0))
    cum = W.partitionBy(id_col).orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    chunked = src.withColumn("b", bnd).withColumn(
        "chunk_id", F.coalesce(F.sum("b").over(cum), F.lit(0)).cast("long")
    )
    ordered_text = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
        ),
    )
    aggs = [
        F.min("pos").alias("chunk_start"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.md5(ordered_text).alias("chunk_hash"),
    ]
    if keep_text:
        # the removal path (boilerplate strip) needs the chunk text back
        # to reconstruct cleaned documents; default off — hashes travel
        # lighter through the dedup-only shuffles
        aggs.append(ordered_text.alias("chunk_text"))
    return chunked.groupBy(id_col, "chunk_id").agg(*aggs)
