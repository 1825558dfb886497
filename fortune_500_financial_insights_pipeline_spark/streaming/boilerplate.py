"""Streaming cross-corpus boilerplate detection with BOUNDED state: a
Bloom CASCADE over CDC chunk hashes — the streaming twin of
operators/text.boilerplate_units, closing the curation family's last
batch-only rule across both execution modes (exact streaming dedup:
bloom_dedup.py; streaming near-dup: minhash_dedup.py; this module:
cross-document template detection).

Semantics: a chunk is boilerplate once it has been seen in >=
``min_docs`` DISTINCT documents cumulatively across the stream. Exact
per-chunk doc-counting is unbounded state (hash -> count map over every
chunk ever seen); the cascade instead keeps ``min_docs`` fixed-size
Bloom filters, where stage j holds the SET of chunk hashes whose
cumulative distinct-doc count has reached j — the top stage IS the
confirmed-boilerplate set, which is what the offline reconciliation
audits. Per micro-batch:

1. CDC-chunk the batch (edit-stable units, operators/chunking),
   collapse to distinct (chunk, doc) pairs, count in-batch distinct
   docs ``c`` per chunk.
2. Probe every stage: ``prior`` = number of stages the hash hits
   (stages are monotone by construction — a hash enters stage j only
   after stages 1..j-1).
3. ``cum = min(prior + c, min_docs)``; boilerplate iff
   ``cum >= min_docs``.
4. Emit per-document online stats (n_units / n_boiler / boiler_frac
   at decision time, against the OLD state — a batch that crashes
   before its first stage swap replays its decisions exactly; a crash
   mid-fold can only have promoted hashes EARLIER, so the replay
   over-flags at worst, never un-flags).
5. Fold the hash into stages ``prior+1 .. cum`` and
   atomically swap each stage (write ``_next``, rename), the
   bloom_dedup discipline.

Replay discipline: probing is not read-only with respect to counting
(a batch's own folds would inflate ``prior`` on a re-run), so the
cascade records the last FOLDED batch_id in the state dir (written
atomically, after every stage swap): a replay of a COMPLETED batch
re-emits (at-least-once delivery) but skips the folds — state is
exactly once. A crash MID-fold replays against partially-promoted
stages, which can only over-flag (safe direction), never un-flag;
individual stage folds are bit-OR idempotent. The remaining caveat is
the same as every set-based counter: the SAME document re-arriving in
a LATER batch re-contributes — run the exact-dedup stage (bloom_dedup
on the doc digest) upstream, which is where the curation funnel puts
it anyway.

Error direction matches the family guarantee: Bloom false positives
INFLATE ``prior``, so a fresh chunk may be over-flagged as boilerplate
(content dropped at the designed FP rate — the safe direction for
training-data curation), while a chunk truly seen in >= min_docs
documents is NEVER missed (always-positive probes). The gap is
measurable offline: :func:`reconcile_boilerplate_report`.

State is ``min_docs`` filters of ``m_bits`` bits each — hard-bounded
regardless of stream length; every probe is a broadcast join (the
filter relation is at most m_bits/32 rows)."""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)
from fortune_500_financial_insights_pipeline_spark.operators.chunking import cdc_chunks
from fortune_500_financial_insights_pipeline_spark.streaming.bloom_dedup import (
    _load_state,
    _swap_state,
)


def _stage_dir(state_dir: str, j: int) -> str:
    return os.path.join(state_dir, f"stage_{j}")


def _last_folded_batch(state_dir: str) -> int | None:
    try:
        with open(os.path.join(state_dir, "_last_batch")) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _mark_folded_batch(state_dir: str, batch_id: int) -> None:
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, "_last_batch_tmp")
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, os.path.join(state_dir, "_last_batch"))


def chunk_units(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    divisor: int = 16,
) -> DataFrame:
    """Distinct (doc, chunk_hash, occ) units of a batch: CDC chunks
    (edit-stable, the same k/divisor rule as q_boilerplate_chunks)
    collapsed per (doc, hash) with the occurrence count kept so per-doc
    stats are occurrence-weighted like the batch operator's."""
    ch = cdc_chunks(df, id_col=id_col, text_col=text_col, k=k, divisor=divisor)
    return ch.groupBy(F.col(id_col).alias("id"), "chunk_hash").agg(
        F.count(F.lit(1)).alias("occ")
    )


def boilerplate_batch_fn(
    id_col: str,
    text_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    min_docs: int = 2,
    k_cdc: int = 3,
    divisor: int = 16,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function: chunk → probe cascade → flag → emit
    per-doc online stats → fold promoted hashes stage by stage. Exposed
    separately so batch backfills replay identical semantics against the
    same state."""
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would flag everything)")
    n_stages = min_docs

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        units = chunk_units(
            batch_df, id_col=id_col, text_col=text_col, k=k_cdc, divisor=divisor
        ).localCheckpoint(eager=True)
        per_hash = units.groupBy("chunk_hash").agg(
            F.countDistinct("id").alias("__c")
        )
        prior = F.lit(0)
        probed = per_hash
        for j in range(1, n_stages + 1):
            state_j = _load_state(spark, _stage_dir(state_dir, j))
            probed = bloom_probe(
                state_j, probed, "chunk_hash", m_bits=m_bits, k=k
            ).withColumnRenamed("maybe_member", f"__hit_{j}")
            prior = prior + F.when(F.col(f"__hit_{j}"), 1).otherwise(0)
        cum = F.least(prior + F.col("__c"), F.lit(min_docs))
        flagged = probed.select(
            "chunk_hash",
            prior.alias("__prior"),
            cum.alias("__cum"),
            (cum >= min_docs).alias("is_boiler"),
        ).localCheckpoint(eager=True)  # decide on the OLD filters pre-swap
        out = (
            units.join(flagged.select("chunk_hash", "is_boiler"), "chunk_hash")
            .groupBy(F.col("id").alias(id_col))
            .agg(
                F.sum("occ").cast("long").alias("n_units"),
                F.sum(F.when(F.col("is_boiler"), F.col("occ")).otherwise(0))
                .cast("long")
                .alias("n_boiler"),
            )
            .withColumn(
                "boiler_frac",
                F.round(F.col("n_boiler").cast("double") / F.col("n_units"), 6),
            )
            .localCheckpoint(eager=True)
        )
        emit(out, batch_id)
        if _last_folded_batch(state_dir) == batch_id:
            return  # replay of a completed batch: emit again, fold never
        # fold: hash enters every stage in (prior, cum]; the top stage
        # (j == min_docs) is the confirmed-boilerplate set
        for j in range(1, n_stages + 1):
            adds = flagged.where(
                (F.col("__prior") < j) & (F.col("__cum") >= j)
            ).select("chunk_hash")
            state_j = _load_state(spark, _stage_dir(state_dir, j))
            merged = (
                state_j.unionByName(
                    bloom_build(adds, "chunk_hash", m_bits=m_bits, k=k)
                )
                .groupBy("word")
                .agg(F.bit_or("bits").alias("bits"))
                .localCheckpoint(eager=True)
            )
            _swap_state(merged, _stage_dir(state_dir, j))
        _mark_folded_batch(state_dir, batch_id)

    return process


def boilerplate_stream(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    min_docs: int = 2,
    k_cdc: int = 3,
    divisor: int = 16,
    m_bits: int = 1 << 20,
    k: int = 3,
):
    """Wire the detector into a streaming query: returns the
    DataStreamWriter (caller adds checkpointLocation/trigger, starts)."""
    fn = boilerplate_batch_fn(
        id_col,
        text_col,
        state_dir,
        emit,
        min_docs=min_docs,
        k_cdc=k_cdc,
        divisor=divisor,
        m_bits=m_bits,
        k=k,
    )
    return stream.writeStream.foreachBatch(fn).outputMode("append")


def reconcile_boilerplate_report(
    corpus: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    k_cdc: int = 3,
    divisor: int = 16,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Offline audit of a finished (or paused) stream's top cascade stage
    against exact batch truth over the full corpus: per distinct chunk,
    TRUE boilerplate = appears in >= min_docs distinct docs (exact
    recount), FLAGGED = the top cascade stage (the confirmed-boilerplate
    set) probes positive. Missed chunks (true AND NOT flagged) must be
    zero — that is the always-positive guarantee; over-flags measure
    realized Bloom false positives (prior inflation). One row: n_chunks /
    n_true / n_flagged / n_over / n_missed / over_rate."""
    spark = corpus.sparkSession
    units = chunk_units(
        corpus, id_col=id_col, text_col=text_col, k=k_cdc, divisor=divisor
    )
    truth = units.groupBy("chunk_hash").agg(
        (F.countDistinct("id") >= min_docs).alias("is_true")
    )
    top = _load_state(spark, _stage_dir(state_dir, min_docs))
    probed = bloom_probe(top, truth, "chunk_hash", m_bits=m_bits, k=k)
    flags = probed.select(
        "chunk_hash", "is_true", F.col("maybe_member").alias("is_flagged")
    )
    one = F.lit(1)
    return flags.agg(
        F.count(one).alias("n_chunks"),
        F.sum(F.when(F.col("is_true"), one).otherwise(0)).cast("long").alias("n_true"),
        F.sum(F.when(F.col("is_flagged"), one).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum(F.when(F.col("is_flagged") & ~F.col("is_true"), one).otherwise(0))
        .cast("long")
        .alias("n_over"),
        F.sum(F.when(F.col("is_true") & ~F.col("is_flagged"), one).otherwise(0))
        .cast("long")
        .alias("n_missed"),
        F.round(
            F.sum(F.when(F.col("is_flagged") & ~F.col("is_true"), 1.0).otherwise(0.0))
            / F.count(one),
            6,
        ).alias("over_rate"),
    )


def reconcile_substring_report(
    corpus: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    k_cdc: int = 3,
    divisor: int = 16,
    m_bits: int = 1 << 20,
    k: int = 3,
    min_lcp: int = 2,
    max_rounds: int = 20,
    sa: DataFrame | None = None,
) -> DataFrame:
    """Offline audit of the STREAMING substring-dedup approximation (this
    module's CDC-chunk Bloom cascade) against the EXACT batch substring
    truth (operators/suffix: suffix-array LCP spans — Lee et al. 2022) —
    the reconcile companion to :func:`reconcile_boilerplate_report`,
    which audits against the chunk-level recount only.

    Two layers, two guarantees:

    * chunk layer (invariant): every chunk whose exact recount reaches
      ``min_docs`` distinct docs MUST be flagged by the top cascade
      stage — CDC boundaries are content-defined (identical content →
      identical chunks) and Bloom probes are always-positive, so
      ``n_missed_chunks`` = 0 always; ``n_over_chunks`` measures realized
      Bloom false positives.
    * span layer (measured gap, not an invariant): the suffix array
      yields the exact set of cross-document duplicated token positions
      (both sides of every adjacent-pair LCP span with lcp >= min_lcp);
      ``span_coverage`` is the fraction of those positions lying inside
      stream-flagged chunks. The shortfall is the stream path's
      granularity loss — duplicated spans shorter than a chunk, or
      straddling chunk boundaries, that only the exact batch pass sees.

    Run it as a scheduled batch job over the stream's input archive; the
    suffix pass is the audit's exact-truth cost (log-round prefix
    doubling, SCALE.md), everything else is linear. Pass a precomputed
    ``sa`` (suffix_array_tokens output for the same corpus) to skip the
    doubling rounds.

    Returns one row: (n_chunks, n_dup_chunks, n_flagged_chunks,
    n_missed_chunks, n_over_chunks, n_dup_positions, n_covered_positions,
    span_coverage)."""
    from fortune_500_financial_insights_pipeline_spark.operators.suffix import (
        suffix_lcp_spans,
    )

    spark = corpus.sparkSession
    chunks = cdc_chunks(
        corpus, id_col=id_col, text_col=text_col, k=k_cdc, divisor=divisor
    ).localCheckpoint(eager=False)

    # chunk layer: exact recount vs top-stage probe
    truth = chunks.groupBy("chunk_hash").agg(
        (F.countDistinct(id_col) >= min_docs).alias("is_dup")
    )
    top = _load_state(spark, _stage_dir(state_dir, min_docs))
    probed = bloom_probe(top, truth, "chunk_hash", m_bits=m_bits, k=k)
    flags = probed.select(
        "chunk_hash", "is_dup", F.col("maybe_member").alias("is_flagged")
    ).localCheckpoint(eager=False)

    # span layer: exact cross-doc duplicated token positions from the SA
    spans = suffix_lcp_spans(
        corpus, id_col=id_col, text_col=text_col, min_lcp=min_lcp,
        max_rounds=max_rounds, sa=sa,
    ).where(F.col("doc_a") != F.col("doc_b"))
    side_a = spans.select(
        F.col("doc_a").alias("doc"), F.col("pos_a").alias("p0"), "lcp"
    )
    side_b = spans.select(
        F.col("doc_b").alias("doc"), F.col("pos_b").alias("p0"), "lcp"
    )
    dup_pos = (
        side_a.unionByName(side_b)
        .select(
            "doc",
            F.explode(
                F.sequence(F.col("p0"), F.col("p0") + F.col("lcp") - 1)
            ).alias("pos"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    flagged_pos = (
        chunks.join(
            flags.where("is_flagged").select("chunk_hash"), "chunk_hash"
        )
        .select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.sequence(
                    F.col("chunk_start"),
                    F.col("chunk_start") + F.col("n_tokens") - 1,
                )
            ).alias("pos"),
        )
        .distinct()
    )
    covered = dup_pos.join(flagged_pos, ["doc", "pos"], "left_semi")

    one = F.lit(1)
    chunk_stats = flags.agg(
        F.count(one).alias("n_chunks"),
        F.sum(F.when(F.col("is_dup"), one).otherwise(0))
        .cast("long").alias("n_dup_chunks"),
        F.sum(F.when(F.col("is_flagged"), one).otherwise(0))
        .cast("long").alias("n_flagged_chunks"),
        F.sum(F.when(F.col("is_dup") & ~F.col("is_flagged"), one).otherwise(0))
        .cast("long").alias("n_missed_chunks"),
        F.sum(F.when(F.col("is_flagged") & ~F.col("is_dup"), one).otherwise(0))
        .cast("long").alias("n_over_chunks"),
    )
    pos_stats = dup_pos.agg(
        F.count(one).cast("long").alias("n_dup_positions")
    ).crossJoin(
        covered.agg(F.count(one).cast("long").alias("n_covered_positions"))
    )
    return chunk_stats.crossJoin(pos_stats).withColumn(
        "span_coverage",
        F.when(
            F.col("n_dup_positions") > 0,
            F.round(
                F.col("n_covered_positions") / F.col("n_dup_positions"), 6
            ),
        ).otherwise(F.lit(None).cast("double")),
    )
