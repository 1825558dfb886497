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

In-batch rule (before the cross-batch probe): within one micro-batch the
minimum doc id in each bucket survives — deterministic, one bucket groupBy
+ semi-join, no transitive closure (chain A~B~C in ONE batch keeps A and
may keep C if A,C share no bucket — the same non-closure batch near-dup
pipelines accept before a periodic cluster-dedup compaction).

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
