"""Streaming form of the training-data curation funnel (SURVEY.md §2.11).

The batch funnel (pipelines/training_data.py) composes per-row gates with
whole-corpus operators. On a live document stream the per-row stages stream
unchanged — quality gate, PII redaction, chunk explosion are stateless
projections/filters — while each corpus-level stage maps to its streaming
dual:

| batch stage                  | streaming dual                              |
|------------------------------|---------------------------------------------|
| fingerprint_dedup (window)   | dropDuplicates on the content hash (state    |
|                              | per digest; add a watermark column to bound  |
|                              | state when the stream has event time)        |
| minhash cluster dedup        | no exact streaming dual (needs the pair      |
|                              | graph); run periodically on the accumulated  |
|                              | corpus via foreachBatch                      |
| quality/entropy percentiles  | fixed thresholds (percentiles are corpus     |
|                              | statistics; recompute offline, feed as conf) |
| Gopher rule suite            | stateless per-row flags (text.gopher_rules)  |
|                              | — streams unchanged, ``gopher_gate=True``    |
| cross-doc boilerplate        | streaming/boilerplate.py: Bloom-cascade over |
| (text.boilerplate_units)     | CDC chunk hashes, bounded state, never-miss  |

So the streaming funnel is: content-hash dedup → fixed-threshold quality
gate → PII redaction → chunk explosion. Everything after the dedup is
append-mode compatible and shuffle-free; the dedup is the only stateful
operator and its state key (md5 digest) is uniformly distributed — no skew.

Near-dup suppression on the stream (minhash_dedup.minhash_dedup_stream)
is recall-oriented by construction — bucket collisions decide, chains
over-suppress in the safe direction. The funnel's MEASUREMENT loop for
that cost is minhash_dedup.reconcile_neardup_report (oracle-certified as
q_neardup_reconcile): run it periodically over the stream's input archive
and emitted sink to get the false-drop rate and Bloom saturation BEFORE
filter exhaustion shows up as corpus loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators import text as TX
from fortune_500_financial_insights_pipeline_spark.operators.chunking import chunk_documents


def streaming_curate(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    chunk_tokens: int = 32,
    overlap: int = 8,
    watermark: tuple[str, str] | None = None,
    gopher_gate: bool = False,
    gopher_stopwords: list[str] | None = None,
) -> DataFrame:
    """Curated chunk stream from a raw document stream.

    ``watermark=(ts_col, delay)`` bounds dedup state when documents carry an
    ingest timestamp; without it the digest state grows with corpus size
    (fine for bounded backfills, not for a forever-stream).

    .. note:: behavior change (round 6): ``gopher_gate=True`` with
       ``gopher_stopwords=None`` now applies the operator's published
       8-word ``GOPHER_STOPWORDS`` default — matching ``gopher_rules``
       run with defaults. It previously used ``EN_STOPWORDS``; callers
       relying on the old gate outcomes must pass
       ``gopher_stopwords=TX.EN_STOPWORDS`` explicitly."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    df = stream.withColumn("fingerprint", F.md5(norm))
    if watermark is not None:
        # dropDuplicatesWithinWatermark dedups by content alone with bounded
        # state — dropDuplicates(["fingerprint", ts_col]) would keep identical
        # content arriving at different event times, silently diverging from
        # the batch funnel's content dedup.
        ts_col, delay = watermark
        df = df.withWatermark(ts_col, delay)
        deduped = df.dropDuplicatesWithinWatermark(["fingerprint"])
    else:
        deduped = df.dropDuplicates(["fingerprint"])

    gated = deduped.where(F.round(TX.quality_score(text_col), 6) >= min_quality)
    if gopher_gate:
        # the published rule suite is integer-exact per-row flags — pure
        # column expressions (text.gopher_flag_columns), so the gate is a
        # stateless inline filter: no join, no state, stream-safe.
        # gopher_stopwords=None uses the operator's published 8-word
        # GOPHER_STOPWORDS default, matching batch gopher_rules run with
        # defaults; pass an explicit list (e.g. TX.EN_STOPWORDS) only for
        # fixture-oriented corpora.
        flags = TX.gopher_flag_columns(
            F.col(text_col), stopwords=gopher_stopwords
        )
        cond = F.lit(True)
        for expr in flags.values():
            cond = cond & expr
        gated = gated.where(cond)
    redacted = gated.withColumn(text_col, TX.redact_pii(text_col))
    keep = [c for c in redacted.columns if c not in (id_col, text_col)]
    return chunk_documents(
        redacted,
        id_col=id_col,
        text_col=text_col,
        chunk_tokens=chunk_tokens,
        overlap=overlap,
        keep_cols=keep,
    )
