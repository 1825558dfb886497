"""MinHash+LSH and SimHash near-duplicate detection (SURVEY.md §2.11).

Shingle → minhash signature → band → bucket-join: the textbook scale-out
near-dup pipeline. All hashing is ``xxhash64(token, seed)`` — JVM-side,
deterministic, no RNG state, no Python in the hot path. The candidate join
is an equi-join on (band index, band hash): a uniform shuffle key, so the
O(n²) pair space never materializes — only same-bucket pairs do.

At 100 TB you tune (n_hashes, bands) for the target Jaccard threshold via
the standard S-curve P(candidate) = 1 - (1 - j^r)^b with r = n_hashes/bands;
the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.text import jaccard, word_ngrams


def minhash_signature(grams: Column, n_hashes: int) -> Column:
    """Array of n minhash values: min over shingles of xxhash64(shingle, seed)."""
    return F.array(
        *[
            F.array_min(F.transform(grams, lambda g: F.xxhash64(g, F.lit(seed))))
            for seed in range(n_hashes)
        ]
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.2,
    ngram: int = 3,
) -> DataFrame:
    """Near-duplicate document pairs: LSH banding for candidates, exact
    word-ngram Jaccard verification. Returns (id_a, id_b, jac), id_a < id_b.
    """
    assert n_hashes % bands == 0, "bands must divide n_hashes"
    rows_per_band = n_hashes // bands

    # Materialize grams as a bound column FIRST (separate projection):
    # passing the raw n-gram expression into the 16-seed signature would
    # re-evaluate the whole tokenize+ngram tree once per seed (Catalyst's
    # CollapseProject declines to merge the projections precisely because
    # the reference is non-cheap and repeated) — measured 7x slower.
    # Tokenize/hash cost scales with text volume but the SCAN's partition
    # count scales with file bytes — a compact corpus (one small parquet
    # file) plans as one task and serializes everything on one core. When
    # the scan under-splits relative to the cluster, buy parallelism with
    # one cheap text-sized shuffle, hash-keyed on id so per-doc gram
    # locality (and the partial-agg collapse below) survives. The shuffle
    # goes UNDER the n-gram projection: repartitioning the projected grams
    # would run the expensive tokenization single-threaded below the
    # exchange and ship the ~3× larger gram arrays instead of raw text.
    # When the input already has >= cores partitions (any real corpus),
    # this is a no-op and no shuffle is added.
    src = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    sc = df.sparkSession.sparkContext
    if src.rdd.getNumPartitions() < sc.defaultParallelism:
        src = src.repartition(sc.defaultParallelism, "_id")
    g = src.select("_id", word_ngrams(F.col("_text"), ngram).alias("_grams"))

    # Signature on the CODEGEN path, not higher-order functions: explode to
    # (id, gram) rows and take per-seed min() in a hash aggregate. The HOF
    # form (array_min ∘ transform per seed) evaluates ~n_hashes·|grams|
    # interpreted lambdas per doc — measured 2.5× slower end-to-end at sf0.1.
    # Values are bit-identical (same min over the same xxhash64 calls).
    # Shuffle stays doc-count-sized: a doc's grams share its input partition,
    # so map-side partial agg collapses to one row per doc before exchange.
    ex = g.select("_id", F.explode("_grams").alias("_g"))
    sig_wide = ex.groupBy("_id").agg(
        *[
            F.min(F.xxhash64("_g", F.lit(seed))).alias(f"_h{seed}")
            for seed in range(n_hashes)
        ]
    )

    # one row per (doc, band): band hash = xxhash64 over the band's slice.
    # Only (id, band, bhash) enters the candidate stage — the gram arrays
    # (the wide payload) never ride the bucket shuffle.
    banded = sig_wide.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"_h{b * rows_per_band + i}").cast("string")
                                    for i in range(rows_per_band)
                                ],
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash"))

    # Candidates via groupBy-collect_list instead of a bucket self-join: the
    # self-join's two scans cannot share the signature subtree (different
    # output aliases defeat ReuseExchange), so the expensive signature would
    # compute TWICE. One groupBy computes it once; the within-bucket pair
    # expansion is the same O(bucket²) the join would produce — small by
    # construction (buckets are near-dup groups), and a skew-bounded bucket
    # cap belongs in the caller if a degenerate corpus makes them collide.
    pair_expr = F.filter(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + 2, F.size("ids")),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        ),
        lambda p: p["id_a"] < p["id_b"],
    )
    cand = (
        banded.groupBy("band", "bhash")
        .agg(F.array_sort(F.collect_list("_id")).alias("ids"))
        .where(F.size("ids") > 1)
        .select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verification: grams re-attached to the (small) candidate set only
    ga = g.select(F.col("_id").alias("id_a"), F.col("_grams").alias("grams_a"))
    gb = g.select(F.col("_id").alias("id_b"), F.col("_grams").alias("grams_b"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jac", F.round(jaccard(F.col("grams_a"), F.col("grams_b")), 6))
        .filter(F.col("jac") >= min_jaccard)
        .select("id_a", "id_b", "jac")
    )


def simhash(text: Column | str, n_bits: int = 64) -> Column:
    """SimHash fingerprint: per token, xxhash64 supplies the bit pattern;
    each bit position accumulates +1/-1 across tokens; the sign vector is
    packed back into a long. Near-dup docs differ in few bits (Hamming).

    One pass, no UDF: token hashes are bound once (transform), then a
    single aggregate folds them into a 63-long counter array via zip_with.
    (A per-bit-column formulation re-hashed every token 63 times — the
    repeated-subexpression trap; see minhash_neardup_pairs.) n_bits <= 63
    keeps the packed value in a signed long.
    """
    c = text if isinstance(text, Column) else F.col(text)
    n_bits = min(n_bits, 63)
    hashes = F.transform(F.split(c, " "), lambda t: F.xxhash64(t))
    zero = F.array_repeat(F.lit(0), n_bits)
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(n_bits)])
    counts = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    powers = F.array(*[F.lit(2 ** i).cast("long") for i in range(n_bits)])
    return F.aggregate(
        F.zip_with(counts, powers, lambda cnt, p: F.when(cnt > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_portable(text: Column | str, n_bits: int = 48) -> Column:
    """SimHash with engine-portable bits: each token's bit pattern comes
    from its first md5 hex digits (4 bits per digit) instead of xxhash64,
    so the identical signature is computable in any engine with
    md5/substring arithmetic — which makes the fingerprint
    DuckDB-oracle-checkable bit for bit (q_simhash_portable). Use simhash
    (xxhash64) when verification doesn't need to cross engines.

    Spark-side the hex prefix is packed into ONE long per token via conv()
    and bits are tested with masks — same fold shape and cost profile as
    the xxhash64 form (a per-bit substring/position formulation measured
    3× slower; the oracle spells the per-digit arithmetic instead, same
    math). Bit i tests hex digit i//4 (left-to-right) at shift i%4; in the
    packed value that digit sits at bits 4·(n_digits−1−i//4)…+3. n_bits ≤
    48 keeps every intermediate exact in double range for the oracle's
    POWER() arithmetic."""
    c = text if isinstance(text, Column) else F.col(text)
    n_bits = min(n_bits, 48)
    nd = n_bits // 4
    vs = F.transform(
        F.split(c, " "),
        lambda t: F.conv(F.substring(F.md5(t), 1, nd), 16, 10).cast("long"),
    )
    masks = F.array(
        *[
            F.lit(1 << (4 * (nd - 1 - i // 4) + (i % 4))).cast("long")
            for i in range(n_bits)
        ]
    )
    zero = F.array_repeat(F.lit(0).cast("long"), n_bits)
    counts = F.aggregate(
        vs,
        zero,
        lambda acc, v: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(v.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    powers = F.array(*[F.lit(2 ** i).cast("long") for i in range(n_bits)])
    return F.aggregate(
        F.zip_with(counts, powers, lambda cnt, p: F.when(cnt > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
