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
