"""Training-data curation pipeline: the end-to-end composition of the
§2.11 operators — what a large-scale LLM-data pipeline runs over a raw
document corpus before tokenization. No counterpart in the reference
(it never touches document text); this is the engine's extension surface
exercised as one job.

Stage order is chosen for 100 TB economics:
1. exact dedup FIRST (cheap hash groupBy removes the bulk — every exact
   copy skipped here never pays minhash signatures);
2. near-dup cluster dedup (MinHash LSH banding → candidate pairs →
   connected components → min-id survivor: transitive closure, so
   A~B~C collapses even when A~C was never a candidate);
3. quality + language gate (pure narrow ops, no shuffle);
4. repetition gate (Gopher top-bigram-fraction rule: doc-keyed aggs +
   a semi-join back — boilerplate that survived dedup dies here);
5. PII redaction (chained-regex projection; BEFORE chunking so no chunk
   ever carries a raw email/SSN/phone/IP; the redaction count rides the
   chunk-count action as an Observation — zero extra scans);
6. chunking (1→N token windows, exchange-free);
7. deterministic hash sampling (partition-invariant: the sample is a
   function of the key, not of executor scheduling);
8. compacted parquet write partitioned by `lang` (small-files control).

Each stage is independently tested; `curate()` returns the final frame
plus per-stage row counts (the curation funnel report every data job
needs for observability).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators import text as TX
from fortune_500_financial_insights_pipeline_spark.operators.chunking import chunk_documents
from fortune_500_financial_insights_pipeline_spark.operators.dedup import fingerprint_dedup
from fortune_500_financial_insights_pipeline_spark.operators.graph import cluster_dedup
from fortune_500_financial_insights_pipeline_spark.operators.minhash import minhash_neardup_pairs
from fortune_500_financial_insights_pipeline_spark.operators.sampling import hash_sample


@dataclass(frozen=True)
class CurationReport:
    n_raw: int
    n_after_exact_dedup: int
    n_after_neardup: int
    n_after_quality: int
    n_after_repetition: int
    n_after_entropy: int
    n_pii_redactions: int
    n_chunks: int
    n_sampled_chunks: int


def curate(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    min_jaccard: float = 0.5,
    max_rep_frac: float = 0.2,
    entropy_band: tuple[float, float] | None = (1.5, 7.0),
    chunk_tokens: int = 32,
    overlap: int = 8,
    sample_fraction: float = 1.0,
    seed: int = 0,
) -> tuple[DataFrame, CurationReport]:
    """Run the full curation funnel; returns (chunks, report).

    The intermediate survivor frames are cached only long enough to count
    them — counts are the observability contract, and each one reuses the
    work of the previous stage instead of re-deriving the lineage.
    """
    n_raw = docs.count()

    exact = fingerprint_dedup(docs, text_col=text_col, id_col=id_col).drop(
        "fingerprint"
    )
    exact = exact.localCheckpoint()  # cut lineage: 3 downstream passes
    n_exact = exact.count()

    pairs = minhash_neardup_pairs(
        exact, id_col=id_col, text_col=text_col,
        n_hashes=16, bands=8, min_jaccard=min_jaccard,
    )
    neardup = cluster_dedup(exact, pairs, id_col).localCheckpoint()
    n_neardup = neardup.count()

    quality = neardup.where(
        F.round(TX.quality_score(text_col), 6) >= min_quality
    ).localCheckpoint()
    n_quality = quality.count()

    rep_ok = (
        TX.repetition_stats(quality, id_col, text_col)
        .where(F.col("top_gram_frac") < max_rep_frac)
        .select(id_col)
    )
    deboiler = quality.join(rep_ok, id_col, "left_semi").localCheckpoint()
    n_rep = deboiler.count()

    if entropy_band is not None:
        # info-theoretic junk gate: drop ultra-low-entropy boilerplate and
        # ultra-high-entropy binary noise (operators/text.py char_entropy);
        # the per-doc signal joins back as a semi-join on the id
        lo, hi = entropy_band
        ent_ok = (
            TX.char_entropy(deboiler, id_col=id_col, text_col=text_col)
            .where(F.col("entropy_bits").between(lo, hi))
            .select(id_col)
        )
        deboiler = deboiler.join(ent_ok, id_col, "left_semi").localCheckpoint()
    n_entropy = deboiler.count()

    from fortune_500_financial_insights_pipeline_spark.checks import observed

    redacted, pii_obs = observed(
        deboiler.withColumn("_n_pii", TX.pii_count(text_col)),
        "pii",
        F.sum("_n_pii").alias("n_redactions"),
    )
    redacted = redacted.withColumn(text_col, TX.redact_pii(text_col)).drop("_n_pii")

    keep = [c for c in redacted.columns if c not in (id_col, text_col)]
    chunks_all = chunk_documents(
        redacted, id_col=id_col, text_col=text_col,
        chunk_tokens=chunk_tokens, overlap=overlap, keep_cols=keep,
    ).localCheckpoint()
    n_chunks = chunks_all.count()
    n_pii = int(pii_obs.get["n_redactions"] or 0)

    chunks = chunks_all
    if sample_fraction < 1.0:
        chunks = hash_sample(
            chunks_all, sample_fraction, [id_col, "chunk_index"], seed=seed
        )
    n_sampled = chunks.count()

    report = CurationReport(
        n_raw=n_raw,
        n_after_exact_dedup=n_exact,
        n_after_neardup=n_neardup,
        n_after_quality=n_quality,
        n_after_repetition=n_rep,
        n_after_entropy=n_entropy,
        n_pii_redactions=n_pii,
        n_chunks=n_chunks,
        n_sampled_chunks=n_sampled,
    )
    return chunks, report


def write_curated(
    chunks: DataFrame, path: str, *, partition_col: str | None = None
) -> None:
    """Land the curated chunks as parquet with small-files control."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import compact_for_write

    out = compact_for_write(chunks)
    writer = out.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(path)
