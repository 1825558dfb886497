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

    Scale shape (round 9): the boundary rule, chunk spans, and chunk
    hashes are ALL functions of one document's own token array, so the
    whole derivation runs row-locally on higher-order array functions —
    no explode of the token stream, no per-doc window sort, no
    collect_list re-assembly. The former plan shuffled every (doc, pos,
    tok) row into a window and back through a groupBy (two corpus-sized
    exchanges carrying the text); this one shuffles only once, up front,
    to spread a compact scan across the cluster (ensure_min_parallelism
    on the narrow id+text projection), then emits one row per CHUNK via a
    single posexplode. Boundary positions, chunk ids, starts, token
    counts and md5 hashes are computed from the same expressions in
    full-array coordinates, so the output is row-identical to the window
    formulation (pinned by the edit-stability and reassembly tests)."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    src = ensure_min_parallelism(
        docs.select(F.col(id_col), F.col(text_col)), id_col
    ).select(F.col(id_col), F.split(F.col(text_col), " ").alias("__tk"))
    tk = F.col("__tk")
    n = F.size(tk)
    # gram ending at 0-based position p = tokens p-k+1..p (1-based slice
    # start p-k+2); md5-long ≡ 0 (mod divisor) marks a boundary AFTER p
    gram_of = lambda p: F.array_join(F.slice(tk, p - F.lit(k) + 2, k), " ")  # noqa: E731
    h_of = lambda p: F.conv(F.substring(F.md5(gram_of(p)), 1, 15), 16, 10).cast(  # noqa: E731
        "long"
    )
    # CASE WHEN evaluates lazily, so the slice under h_of never sees the
    # out-of-range starts of the first k-1 positions
    bnds = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda p: F.when(
            p >= k - 1, F.pmod(h_of(p), F.lit(divisor)) == 0
        ).otherwise(F.lit(False)),
    )
    # a boundary on the LAST token starts no chunk; chunk i spans
    # [starts[i], ends[i]] in 0-based token positions
    inner = F.filter(bnds, lambda b: b < n - 1)
    starts = F.concat(F.array(F.lit(0)), F.transform(inner, lambda b: b + 1))
    ends = F.concat(inner, F.array(n - 1))
    chunked = src.select(
        F.col(id_col),
        tk,
        F.posexplode(F.arrays_zip(starts.alias("s"), ends.alias("e"))).alias(
            "__cid", "__span"
        ),
    )
    s, e = F.col("__span.s"), F.col("__span.e")
    chunk_text = F.array_join(F.slice(tk, s + 1, e - s + 1), " ")
    cols = [
        F.col(id_col),
        F.col("__cid").cast("long").alias("chunk_id"),
        s.alias("chunk_start"),
        (e - s + 1).cast("long").alias("n_tokens"),
        F.md5(chunk_text).alias("chunk_hash"),
    ]
    if keep_text:
        # the removal path (boilerplate strip) needs the chunk text back
        # to reconstruct cleaned documents; default off — hashes travel
        # lighter through the dedup-only shuffles
        cols.append(chunk_text.alias("chunk_text"))
    return chunked.select(*cols)
