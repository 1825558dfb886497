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

from fortune_500_financial_insights_pipeline_spark.operators.compact import ensure_min_parallelism
from fortune_500_financial_insights_pipeline_spark.operators.text import jaccard, word_ngrams


def bucket_pairs(
    buckets: DataFrame,
    key_cols: list[str],
    id_col: str,
    carry_cols: tuple[str, ...] = (),
    max_bucket: int | None = None,
    pair_filter=None,
    dedup: bool = True,
    wide_expand: bool = False,
) -> DataFrame:
    """All (a, b) pairs within each bucket with ``a.id < b.id``, via ONE
    groupBy + within-array expansion instead of a bucket self-join.

    The self-join form computes the (usually expensive) bucket-key subtree
    TWICE: its two branches alias columns differently, so ReuseExchange
    never fires. One collect_list computes it once; the within-bucket
    expansion is the same O(bucket²) output the join would produce. Buckets
    are near-dup groups — small by construction on a healthy corpus.

    ``max_bucket`` is the skew guard for degenerate corpora (boilerplate
    floods, constant fields): a bucket of b members emits b(b-1)/2 pairs,
    so ONE 100k-member bucket is 5e9 pairs — at 100 TB you cap and drop
    such buckets (standard LSH practice: an over-full bucket carries no
    discriminating signal anyway). None = emit everything.

    Returns id_a, id_b (+ each carry col as ``{c}_a``/``{c}_b``); pairs
    seen in several buckets are deduplicated. ``carry_cols`` must be
    functionally dependent on the id (a signature, a gram array): the
    dedup keeps one arbitrary bucket's row per pair, which is only
    row-identical under that dependency.

    ``pair_filter`` (round 9, guide §2.4): optional ``(a, b) -> Column``
    predicate over the two member structs (fields: ``i`` + carry cols; the
    grouping keys are in scope as outer columns), applied INSIDE the pair
    array before the explode. When the carried payload lets a pair decide
    row-locally whether THIS bucket is its first (e.g. simhash: every
    band value is arithmetic on the two carried signatures), pass the
    first-match predicate and ``dedup=False``: pairs are then globally
    unique by construction and the corpus-pairs-sized dropDuplicates
    exchange disappears from the plan entirely.

    ``wide_expand`` (round 9, guide §2.5): the grouped bucket arrays are a
    few MB even when the pair fan-out is in the hundreds of thousands, so
    AQE coalesces the post-aggregate stage to a handful of partitions and
    the expansion runs nearly serial. The explicit keyed repartition
    REPLACES the aggregate's implicit exchange (same key — still exactly
    one shuffle) and, being user-specified, is AQE-coalesce-exempt; sized
    max(defaultParallelism, spark.sql.shuffle.partitions), the setjoin
    idiom, so production confs scale it up. Opt-in: callers whose buckets
    are tiny keep the default plan."""
    if wide_expand:
        spark = buckets.sparkSession
        try:
            n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):  # e.g. "auto" under some deployments
            n_shuffle = spark.sparkContext.defaultParallelism
        n_wide = max(spark.sparkContext.defaultParallelism, n_shuffle)
        buckets = buckets.repartition(n_wide, *key_cols)
    payload = F.struct(
        F.col(id_col).alias("i"), *[F.col(c).alias(c) for c in carry_cols]
    )
    # array_sort on structs orders by the leading field (the id), so the
    # i-th element always precedes the j-th for i<j — a<b by construction.
    pair_expr = F.flatten(
        F.transform(
            F.col("xs"),
            lambda x, i: F.transform(
                F.slice(F.col("xs"), i + 2, F.size("xs")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    grouped = (
        buckets.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list(payload)).alias("xs"))
        .where(F.size("xs") > 1)
    )
    if max_bucket is not None:
        grouped = grouped.where(F.size("xs") <= max_bucket)
    pairs_arr = pair_expr
    if pair_filter is not None:
        pairs_arr = F.filter(pair_expr, lambda pr: pair_filter(pr["a"], pr["b"]))
    out = grouped.select(F.explode(pairs_arr).alias("p"))
    cols = [F.col("p.a.i").alias("id_a"), F.col("p.b.i").alias("id_b")]
    for c in carry_cols:
        cols += [F.col(f"p.a.{c}").alias(f"{c}_a"), F.col(f"p.b.{c}").alias(f"{c}_b")]
    res = out.select(*cols)
    return res.dropDuplicates(["id_a", "id_b"]) if dedup else res


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
    # The parallelism guard goes UNDER the n-gram projection: repartitioning
    # the projected grams would run the expensive tokenization
    # single-threaded below the exchange and ship the ~3× larger gram
    # arrays instead of raw text (see ensure_min_parallelism).
    src = ensure_min_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")), "_id"
    )
    # Tokenization is interpreted-HOF work consumed by THREE branches (the
    # signature and both verify rejoins, whose aliases defeat ReuseExchange)
    # — checkpoint the gram table once, same cut as setjoin's ordered table.
    g = src.select(
        "_id", word_ngrams(F.col("_text"), ngram).alias("_grams")
    ).localCheckpoint(eager=False)

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

    cand = bucket_pairs(banded, ["band", "bhash"], "_id")
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


def minhash_neardup_pairs_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.2,
    ngram: int = 3,
) -> DataFrame:
    """``minhash_neardup_pairs`` with an engine-portable hash family, so
    the WHOLE pipeline — signatures, banding, candidate set, verified
    pairs — is oracle-checkable instead of rows-only.

    Hashing: one md5 per shingle, expanded to ``n_hashes`` seeds by
    Kirsch–Mitzenmacher double hashing (seed_i = (u1 + i·u2) mod 2^60 with
    u1 = md5 bits 0-59, u2 = md5 bits 64-119 mod 2^56 — bounds chosen so
    u1 + 15·u2 < 2^63 never overflows a BIGINT in either engine). Same
    plan shape as the xxhash64 form: exploded (doc, gram) rows, per-seed
    mins as ONE hash aggregate (map-side combined, doc-count-sized
    shuffle), band equi-join, within-bucket pair expansion, exact-integer
    Jaccard verify. md5 costs more per gram than xxhash64 — the price of
    portability; production keeps the xxhash64 form, the portable one
    exists so the oracle can certify the ALGORITHM."""
    assert n_hashes % bands == 0, "bands must divide n_hashes"
    r = n_hashes // bands
    m60 = 1 << 60

    src = ensure_min_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")), "_id"
    )
    g = src.select(
        "_id", word_ngrams(F.col("_text"), ngram).alias("_grams")
    ).localCheckpoint(eager=False)

    hx = F.md5(F.col("_gram"))
    u1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    u2 = F.conv(F.substring(hx, 17, 15), 16, 10).cast("long") % (1 << 56)
    exploded = (
        g.select("_id", F.explode("_grams").alias("_gram"))
        .select("_id", u1.alias("_u1"), u2.alias("_u2"))
    )
    sig = exploded.groupBy("_id").agg(
        *[
            F.min((F.col("_u1") + F.lit(i) * F.col("_u2")) % m60).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_", *[F.col(f"h{b * r + j}").cast("string") for j in range(r)]
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select("_id", F.explode(band_entries).alias("e")).select(
        "_id", F.col("e.band").alias("band"), F.col("e.key").alias("key")
    )
    cand = bucket_pairs(buckets, ["band", "key"], "_id")
    ga = g.select(F.col("_id").alias("id_a"), F.col("_grams").alias("_ga"))
    gb = g.select(F.col("_id").alias("id_b"), F.col("_grams").alias("_gb"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jac", F.round(jaccard(F.col("_ga"), F.col("_gb")), 6))
        .filter(F.col("jac") >= min_jaccard)
        .select("id_a", "id_b", "jac")
    )


def _prep_portable_buckets(
    df: DataFrame, id_col: str, text_col: str,
    n_hashes: int, bands: int, ngram: int,
) -> "tuple[DataFrame, DataFrame]":
    """(grams, band buckets) for one corpus side under the PORTABLE hash
    family (md5 + Kirsch–Mitzenmacher double hashing — the exact
    arithmetic of minhash_neardup_pairs_portable, so signatures computed
    here are interchangeable with persisted ones)."""
    r = n_hashes // bands
    m60 = 1 << 60
    src = ensure_min_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")),
        "_id",
    )
    g = src.select(
        "_id", word_ngrams(F.col("_text"), ngram).alias("_grams")
    ).localCheckpoint(eager=False)
    hx = F.md5(F.col("_gram"))
    u1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    u2 = F.conv(F.substring(hx, 17, 15), 16, 10).cast("long") % (1 << 56)
    exploded = (
        g.select("_id", F.explode("_grams").alias("_gram"))
        .select("_id", u1.alias("_u1"), u2.alias("_u2"))
    )
    sig = exploded.groupBy("_id").agg(
        *[
            F.min((F.col("_u1") + F.lit(i) * F.col("_u2")) % m60).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_", *[F.col(f"h{b * r + j}").cast("string") for j in range(r)]
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select("_id", F.explode(band_entries).alias("e")).select(
        "_id", F.col("e.band").alias("band"), F.col("e.key").alias("key")
    )
    return g, buckets


def minhash_neardup_pairs_incremental_portable(
    new: DataFrame,
    old: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.2,
    ngram: int = 3,
    max_bucket: "int | None" = None,
) -> DataFrame:
    """INCREMENTAL near-dup pairs: every verified pair TOUCHING the new
    increment — (new × new) from a bucket self-expansion over the new
    side only, plus (new × old) from a band equi-join against the old
    side's buckets — and NEVER an old×old pair. This is the daily-
    ingest shape at 100 TB: the accumulated corpus's bucket and gram
    tables are persisted artifacts (the ``_prep_portable_buckets``
    subtrees here are exactly those artifacts — swap a table read in),
    so each increment pays work proportional to |new| plus the
    candidates it touches, not a full-corpus recompute. The old-side
    pair space (the quadratic term that dominates a recompute) never
    materializes — not even as collect_list arrays: ``bucket_pairs``
    runs over new-side buckets only, and the cross join emits only
    (new, old) rows.

    Returns (id_a, id_b, jac, pair_kind) with id_a < id_b and
    pair_kind in {'new_new', 'new_old'}; ids must be globally unique
    across both sides. Hash family and verify are byte-identical to
    :func:`minhash_neardup_pairs_portable`, so on (new ∪ old) minus
    the old×old pairs the two functions agree exactly — the oracle
    certifies precisely that."""
    assert n_hashes % bands == 0, "bands must divide n_hashes"
    g_new, b_new = _prep_portable_buckets(
        new, id_col, text_col, n_hashes, bands, ngram
    )
    g_old, b_old = _prep_portable_buckets(
        old, id_col, text_col, n_hashes, bands, ngram
    )
    cand_nn = bucket_pairs(
        b_new, ["band", "key"], "_id", max_bucket=max_bucket
    ).withColumn("pair_kind", F.lit("new_new"))
    cand_no = (
        b_new.select(F.col("_id").alias("_nid"), "band", "key")
        .join(
            b_old.select(F.col("_id").alias("_oid"), "band", "key"),
            ["band", "key"],
        )
        .select(
            F.least("_nid", "_oid").alias("id_a"),
            F.greatest("_nid", "_oid").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("pair_kind", F.lit("new_old"))
    )
    cand = cand_nn.unionByName(cand_no)
    grams = g_new.unionByName(g_old)
    ga = grams.select(F.col("_id").alias("id_a"), F.col("_grams").alias("_ga"))
    gb = grams.select(F.col("_id").alias("id_b"), F.col("_grams").alias("_gb"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jac", F.round(jaccard(F.col("_ga"), F.col("_gb")), 6))
        .filter(F.col("jac") >= min_jaccard)
        .select("id_a", "id_b", "jac", "pair_kind")
    )
