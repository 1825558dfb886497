"""Streaming MinHash-LSH NEAR-duplicate dedup with bounded state — the
streaming twin of operators/minhash.py's batch near-dup pipeline, closing
the dedup family across both execution modes (exact streaming dedup:
streaming/bloom_dedup.py; batch near-dup: minhash_neardup_pairs).

Semantics: a document is suppressed when any of its LSH band buckets was
already occupied by an emitted document — the standard online near-dup
rule (candidate = bucket collision at the tuned S-curve threshold; there
is no cheap way to fetch the earlier occupant for an exact verify in a
stream, so the bucket collision IS the decision, recall-oriented like
every production online LSH deduper). The guarantee mirrors
bloom_dedup's, lifted from keys to buckets: **no two emitted documents
ever share a band bucket** — a Bloom false positive or an in-batch
collision only ever drops a fresh document (corpus-poisoning duplicates
are the asymmetric cost in training-data ingestion), never re-emits one.

State is a persisted Bloom filter over band-bucket keys — ``m_bits`` bits
HARD-bounded regardless of stream length, atomically swapped per batch
(write `_next`, rename) so a crashed batch replays against the old filter:
at-least-once state update + always-positive probes keep the no-shared-
bucket guarantee across restarts.

In-batch rule (before the cross-batch probe): within one micro-batch a
doc survives only if it is the minimum id in EVERY bucket it occupies —
minima are computed against the RAW batch bucket occupancy, not against
the surviving set. So in a chain A~B~C (A<B<C, A·B and B·C each sharing a
bucket, A·C sharing none) B loses to A and C loses to B, and C is dropped
even though B itself was dropped — one deterministic bucket groupBy +
anti-join, no iteration to a survivor fixpoint. This over-suppresses
relative to a sequential arrival of the same docs (which would have kept
C) but only ever in the safe direction — a fresh doc is dropped, a
duplicate is never re-emitted — and it is the semantics a replayed
backfill reproduces exactly. The false-drop rate this and Bloom
collisions introduce is measurable offline: see
:func:`reconcile_neardup_report`.

Signature discipline is minhash_neardup_pairs': grams exploded to rows,
per-seed min in ONE hash aggregate (codegen path, map-side partial agg →
doc-count-sized shuffle), never per-seed HOF lambdas.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)
from fortune_500_financial_insights_pipeline_spark.operators.text import word_ngrams
from fortune_500_financial_insights_pipeline_spark.streaming.bloom_dedup import (
    _load_state,
    _swap_state,
)


def band_bucket_keys(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
) -> DataFrame:
    """(id, band_key) — one row per (document, LSH band); band_key packs
    (band index, xxhash64 of the band's signature slice) into one string
    so downstream treats buckets as opaque keys."""
    assert n_hashes % bands == 0, "bands must divide n_hashes"
    r = n_hashes // bands
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), ngram)).alias("_g"),
    )
    sig = ex.groupBy("id").agg(
        *[
            F.min(F.xxhash64("_g", F.lit(seed))).alias(f"_h{seed}")
            for seed in range(n_hashes)
        ]
    )
    keys = [
        F.concat_ws(
            "|",
            F.lit(str(b)),
            F.xxhash64(*[F.col(f"_h{b * r + i}") for i in range(r)]).cast("string"),
        )
        for b in range(bands)
    ]
    return sig.select("id", F.explode(F.array(*keys)).alias("band_key"))


def minhash_dedup_batch_fn(
    id_col: str,
    text_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    n_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function: band → in-batch min-id survivor per
    bucket → Bloom probe against emitted buckets → emit → fold survivor
    buckets into the filter. Exposed separately so batch backfills replay
    the identical semantics against the same state."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = _load_state(spark, state_dir)
        once = batch_df.dropDuplicates([id_col])
        bk = band_bucket_keys(
            once, id_col, text_col, n_hashes=n_hashes, bands=bands, ngram=ngram
        ).localCheckpoint(eager=True)
        # in-batch: a doc survives only if it is the min id in EVERY one of
        # its buckets (bucket-count-sized aggregate + anti-join back)
        losers = (
            bk.join(
                bk.groupBy("band_key").agg(F.min("id").alias("_min_id")),
                "band_key",
            )
            .where(F.col("id") != F.col("_min_id"))
            .select("id")
            .distinct()
        )
        batch_kept = bk.join(losers, "id", "left_anti")
        # cross-batch: drop any doc whose ANY bucket probes positive
        probed = bloom_probe(state, batch_kept, "band_key", m_bits=m_bits, k=k)
        hit_ids = (
            probed.where(F.col("maybe_member")).select("id").distinct()
        )
        fresh_keys = (
            batch_kept.join(hit_ids, "id", "left_anti").localCheckpoint(eager=True)
        )
        fresh_ids = fresh_keys.select("id").distinct()
        out = once.join(
            fresh_ids.select(F.col("id").alias(id_col)), id_col, "left_semi"
        ).localCheckpoint(eager=True)  # decide on the OLD filter before the swap
        emit(out, batch_id)
        merged = (
            state.unionByName(
                bloom_build(fresh_keys, "band_key", m_bits=m_bits, k=k)
            )
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
            .localCheckpoint(eager=True)
        )
        _swap_state(merged, state_dir)

    return process


def reconcile_neardup_report(
    corpus: DataFrame,
    emitted_ids: DataFrame,
    id_col: str,
    text_col: str,
    state_dir: str | None = None,
    min_jaccard: float = 0.2,
    n_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    m_bits: int = 1 << 20,
    k: int = 3,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Periodic batch reconciliation for the online near-dup deduper: one
    row quantifying how much the stream's recall-oriented shortcuts
    (bucket-collision-only decisions, raw-minima in-batch suppression,
    Bloom false positives) actually cost on the corpus seen so far.

    ``pairs`` optionally supplies the verified near-dup pair list
    (id_a, id_b) directly — pass the EXACT prefix-filtered set-similarity
    join (operators/setjoin.jaccard_pairs_exact) for a banding-free,
    engine-portable truth (what the oracle-certified q_neardup_reconcile
    key does); default None builds the banded MinHash pipeline below.

    A dropped doc's suppression is JUSTIFIED when the emitted corpus
    contains a verified near-duplicate of it — exact n-gram Jaccard >=
    ``min_jaccard`` via the batch pipeline
    (operators/minhash.minhash_neardup_pairs: banded candidates, never
    O(n²)). Everything else the stream dropped is a FALSE DROP: a bucket
    collision without real similarity, an in-batch chain whose middle
    link was itself suppressed (the over-suppression case documented
    above), or a Bloom false positive. Note the deliberately strict
    definition: a doc whose only true near-dup was itself dropped counts
    as false — the emitted corpus lost that content, whatever the
    mechanism.

    Also reports Bloom saturation from ``state_dir`` (fill ratio and the
    implied per-doc false-positive probability ``1-(1-fill^k)^bands``) so
    operators see filter exhaustion BEFORE the false-drop rate climbs.
    Run it from a scheduled batch job over the stream's input archive and
    its emitted sink; both sides are ordinary tables.

    Returns one row: (n_corpus, n_emitted, n_dropped, n_true_drops,
    n_false_drops, false_drop_rate, bloom_fill_ratio,
    bloom_est_fp_per_doc).
    """
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        minhash_neardup_pairs,
    )

    spark = corpus.sparkSession
    docs = corpus.dropDuplicates([id_col]).localCheckpoint(eager=False)
    emitted = (
        emitted_ids.select(F.col(emitted_ids.columns[0]).alias("_eid"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if pairs is None:
        pairs = minhash_neardup_pairs(
            docs, id_col, text_col,
            n_hashes=n_hashes, bands=bands, min_jaccard=min_jaccard, ngram=ngram,
        )
    sym = pairs.select(
        F.col("id_a").alias("_x"), F.col("id_b").alias("_y")
    ).unionByName(pairs.select(F.col("id_b").alias("_x"), F.col("id_a").alias("_y")))
    dropped = docs.join(
        emitted, docs[id_col] == F.col("_eid"), "left_anti"
    ).select(F.col(id_col).alias("_did"))
    justified = (
        dropped.join(sym, dropped._did == sym._x)
        .join(emitted, sym._y == F.col("_eid"), "left_semi")
        .select("_did")
        .distinct()
    )
    counts = (
        docs.agg(F.count(F.lit(1)).alias("n_corpus"))
        .crossJoin(emitted.agg(F.count(F.lit(1)).alias("n_emitted")))
        .crossJoin(dropped.agg(F.count(F.lit(1)).alias("n_dropped")))
        .crossJoin(justified.agg(F.count(F.lit(1)).alias("n_true_drops")))
    )
    if state_dir is not None:
        fill = (
            _load_state(spark, state_dir)
            .agg(F.coalesce(F.sum(F.bit_count("bits")), F.lit(0)).alias("_set"))
            .select((F.col("_set") / F.lit(float(m_bits))).alias("bloom_fill_ratio"))
        )
    else:
        fill = spark.range(1).select(F.lit(None).cast("double").alias("bloom_fill_ratio"))
    fp_per_probe = F.pow(F.col("bloom_fill_ratio"), F.lit(float(k)))
    return (
        counts.crossJoin(fill)
        .withColumn("n_false_drops", F.col("n_dropped") - F.col("n_true_drops"))
        .select(
            "n_corpus",
            "n_emitted",
            "n_dropped",
            "n_true_drops",
            "n_false_drops",
            F.round(
                F.when(
                    F.col("n_dropped") > 0,
                    F.col("n_false_drops") / F.col("n_dropped"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("false_drop_rate"),
            F.round("bloom_fill_ratio", 6).alias("bloom_fill_ratio"),
            F.round(
                F.lit(1.0) - F.pow(F.lit(1.0) - fp_per_probe, F.lit(float(bands))),
                6,
            ).alias("bloom_est_fp_per_doc"),
        )
    )


def minhash_dedup_stream(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    n_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    m_bits: int = 1 << 20,
    k: int = 3,
):
    """Wire the near-dup dedup into a streaming query: returns the
    DataStreamWriter (caller adds checkpointLocation/trigger and starts)."""
    fn = minhash_dedup_batch_fn(
        id_col, text_col, state_dir, emit,
        n_hashes=n_hashes, bands=bands, ngram=ngram, m_bits=m_bits, k=k,
    )
    return stream.writeStream.foreachBatch(fn).outputMode("append")
