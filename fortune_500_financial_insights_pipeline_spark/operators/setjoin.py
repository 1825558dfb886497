"""Exact set-similarity self-join via prefix filtering (AllPairs/PPJoin).

The brute-force exact-Jaccard pair join is an O(n²) nested-loop with an
array-intersection filter — fine at 500 fixture docs, hopeless at corpus
scale. Prefix filtering (Chaudhuri et al., "A Primitive Operator for
Similarity Joins", ICDE 2006; Xiao et al., "Efficient Similarity Joins for
Near Duplicate Detection", WWW 2008) keeps the EXACT same output while
generating candidates with an equi-join:

1. Impose one global token order (rarest first: ascending corpus frequency,
   ties by token) and sort each record's token set by it.
2. Keep each record's *prefix*: its first ``|g| - ceil(t·|g|) + 1`` tokens.
   Prefix-filtering principle: two sets with Jaccard >= t MUST share at
   least one token inside both prefixes — any pair the equi-join on prefix
   tokens misses provably fails the threshold.
3. Equi-join records on shared prefix token (a shuffle on the token, not a
   cartesian), dedup candidate pairs, then verify true Jaccard on just the
   candidates.

Scale shape: the candidate join shuffles (token, id, grams) tuples keyed by
rare tokens — frequency-ascending order makes hot tokens land at the END of
records, so they rarely enter prefixes and the join key distribution is
anti-skewed by construction. Candidate count tracks the number of truly
similar pairs, not n². Unlike MinHash LSH banding (operators/minhash.py),
output is exact — no probabilistic recall — so the DuckDB brute-force
oracle still value-matches verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_pairs_exact(
    grams: DataFrame,
    id_col: str = "doc_id",
    gram_col: str = "grams",
    threshold: float = 0.8,
    return_similarity: bool = False,
    return_counts: bool = False,
    broadcast_cands: bool = False,
) -> DataFrame:
    """(id_a, id_b) with id_a < id_b and Jaccard(grams_a, grams_b) >= t.

    ``grams`` is one row per record with a distinct-token array column.
    Output is identical to the brute-force cross-join filter — prefix
    filtering only prunes candidate GENERATION, never results.

    ``return_counts`` adds the exact integer (n_i, n_u) intersection/union
    sizes instead of the rounded similarity — the lossless form: any
    stricter threshold is then a plain ``n_i/n_u >= t`` filter over this
    result (identical to rebuilding at t, since prefix filtering never
    loses pairs), which is what the per-process pair memo in
    queries/_core.py relies on.

    ``broadcast_cands=True`` broadcast-hints the (un-deduplicated, round
    10) candidate pair list into the two gram-array re-attach joins, so
    the array payloads never ride an exchange (guide-§8 shape: heavy rows
    move zero times, the id-pair proxy decides). Opt-in because the
    candidate list is data-dependent — bounded for near-dup-sized corpora
    (the memo path), unbounded in the adversarial worst case.
    """
    recs = grams.select(F.col(id_col).alias("_id"), F.col(gram_col).alias("_g"))

    tok = recs.select("_id", F.explode("_g").alias("t"))
    # freq is vocabulary-sized; the lazy checkpoint lets the injectivity
    # guard below read the materialized 1-pass aggregate instead of
    # re-tokenizing the corpus for a second action (round 10)
    freq = (
        tok.groupBy("t").agg(F.count(F.lit(1)).alias("f"))
        .localCheckpoint(eager=False)
    )

    # Verify-stage token ids (round 10, guide §2.3 "narrower types"):
    # array_intersect over long bigram STRINGS hash-builds on string bytes
    # per pair — the dominant verify cost (measured 2.5-3.0 s vs 1.3 s at
    # sf0.1 / 784k candidate rows). xxhash64 token ids make it long-typed,
    # IF the hash is injective on THIS vocabulary — checked, not assumed:
    # one trivial aggregate over the (already materialized,
    # vocabulary-sized) freq frame proves zero collisions, else the
    # string arrays are used unchanged (lossless fallback — this is what
    # round 9's measured-negative #22 lacked: its per-gram collision
    # guard re-aggregated the corpus; this guard is vocab-sized and runs
    # once). Intersection/union SIZES are identical under any injection.
    try:
        grow = freq.agg(
            F.count("t").alias("n"),
            F.count_distinct(F.xxhash64("t")).alias("nh"),
        ).head()
        use_ids = bool(grow["n"] == grow["nh"])
    except Exception:  # noqa: BLE001 — guard is an optimization, never a gate
        use_ids = False

    # Rebuild each record's token list sorted by the global (freq, token)
    # order: array_sort on (freq, token) structs — all JVM-side.
    #
    # The explicit keyed repartition REPLACES the aggregate's implicit
    # ENSURE_REQUIREMENTS exchange (same key, so the groupBy reuses the
    # partitioning — still exactly one shuffle) and, being user-specified,
    # is exempt from AQE partition coalescing. That matters because every
    # downstream stage of this operator (prefix posexplode, candidate
    # join input, and above all the array-intersect verify) reads the
    # checkpointed `ordered` partitions directly: AQE sizes partitions by
    # BYTES, and a few MB of gram arrays coalesce to ~4 partitions while
    # carrying minutes of per-row CPU (measured round 9: verify ran
    # 4-wide on 32 cores; a session-global minPartitionSize=64k floor
    # fixed this stage but taxed every small exchange in the engine —
    # q_kcore 2x slower — so the width is pinned here, at the one
    # CPU-dense site, instead). Sized max(defaultParallelism,
    # spark.sql.shuffle.partitions) so production confs scale it up.
    spark = grams.sparkSession
    try:
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. "auto" under some deployments
        n_shuffle = spark.sparkContext.defaultParallelism
    n_wide = max(spark.sparkContext.defaultParallelism, n_shuffle)
    ordered = (
        tok.join(freq, "t")
        .repartition(n_wide, "_id")
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("f", "t"))).alias("_ord"))
        .select(
            "_id",
            F.transform("_ord", lambda s: s["t"]).alias("_g"),
            # global frequency per (rarity-sorted) position, kept so the
            # prefix stage below can drop once-in-the-corpus tokens without
            # a rejoin against freq
            F.transform("_ord", lambda s: s["f"]).alias("_f"),
            # long token ids for the verify intersect (guarded above)
            F.transform("_ord", lambda s: F.xxhash64(s["t"])).alias("_gid"),
        )
        # Four consumers (both prefix-join branches + both verify rejoins)
        # would each recompute the token-frequency join and the per-record
        # sort; the branches alias differently so ReuseExchange never fires.
        # A lazy localCheckpoint materializes it once and truncates lineage
        # (same pattern as graph.label_propagation's iteration cut).
        .localCheckpoint(eager=False)
    )

    # Prefix length p = |g| - ceil(t*|g|) + 1 (overlap of a qualifying pair
    # exceeds |g| - p, so it must touch the prefix). posexplode keeps each
    # prefix token's position for the positional filter below.
    #
    # Every ceil() here subtracts a small epsilon first: 0.8*190 is exactly
    # 152 in rationals but 152.0000000000001 in doubles, and a ceil that
    # overshoots to 153 silently turns a lossless filter into a lossy one
    # (shorter prefix / stricter bound than the lemma allows). Erring one
    # token looser only admits extra candidates the verify step re-checks.
    eps = 1e-6
    p = (
        F.size("_g") - F.ceil(F.lit(threshold) * F.size("_g") - eps) + 1
    ).cast("int")
    # Corpus-unique tokens (f = 1) can never match in the self-join below —
    # dropping their prefix rows is lossless and cuts the join input hard:
    # rarity-first ordering puts exactly the unique tokens at the FRONT of
    # every prefix, so on mostly-unique corpora they ARE most of the prefix
    # (measured at sf0.01: prefix join input ~18k → 9.1k rows, cold build
    # 12.0 → 8.0 s — SCALE.md round-5; the win grows with corpus-unique
    # mass). Positions are preserved from the full ordered array (the
    # positional filter's lemma is stated in full-array coordinates), hence
    # posexplode-then-filter rather than filter-then-posexplode.
    prefixes = ordered.select(
        "_id",
        F.size("_g").alias("sz"),
        F.posexplode(
            F.arrays_zip(
                F.slice("_g", 1, p).alias("t"), F.slice("_f", 1, p).alias("f")
            )
        ).alias("pos", "tf"),
    ).select(
        "_id",
        "sz",
        "pos",
        F.col("tf.t").alias("t"),
        F.col("tf.f").alias("f"),
    ).where(F.col("f") >= 2).drop("f")

    # Candidates as bare id pairs first (the token join can fan out — keep
    # its shuffle rows narrow), then re-attach the token arrays for the
    # verify step with two id-keyed joins. Two more PPJoin prunes run on the
    # narrow rows before the dedup shuffle:
    #  * length filter — Jaccard >= t forces t <= |a|/|b| <= 1/t;
    #  * positional filter — a shared token at 0-based positions (pa, pb)
    #    allows at most 1 + min(sza-pa-1, szb-pb-1) overlap from itself
    #    onward, which must reach ceil(t/(1+t)*(sza+szb)), the overlap a
    #    qualifying pair needs. The bound ignores common tokens BEFORE
    #    (pa, pb), so it only holds for the pair's earliest common token —
    #    which is always one of the joined rows (it precedes, hence sits
    #    inside, both prefixes), so keep-if-ANY-row-passes stays lossless.
    a = prefixes.select(
        F.col("_id").alias("id_a"), F.col("sz").alias("sza"), F.col("pos").alias("pa"), "t"
    )
    b = prefixes.select(
        F.col("_id").alias("id_b"), F.col("sz").alias("szb"), F.col("pos").alias("pb"), "t"
    )
    alpha = F.ceil(
        F.lit(threshold) / (1 + threshold) * (F.col("sza") + F.col("szb")) - eps
    )
    ubound = 1 + F.least(
        F.col("sza") - F.col("pa") - 1, F.col("szb") - F.col("pb") - 1
    )
    # Candidates stream STRAIGHT into the verify, un-deduplicated (round
    # 10, guide §2.4 "remove shuffles outright"): the old dropDuplicates
    # here was a full exchange+aggregate over every candidate pair (667k
    # at sf0.1) run BEFORE the verify — but duplicate candidate rows (one
    # per extra shared prefix token, measured 1.17x at sf0.1) verify to
    # bit-identical rows, so deduplicating the few SURVIVORS after the
    # verify filter is equivalent and removes the exchange from the hot
    # path. Chain measured 3.5 s → 1.3 s warm at sf0.1 (with the id
    # arrays above); pair set identical (brute-force suites + both-SF
    # memo compare).
    cands = (
        a.join(b, "t")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.col("szb") >= F.ceil(F.lit(threshold) * F.col("sza") - eps))
        .where(F.col("sza") >= F.ceil(F.lit(threshold) * F.col("szb") - eps))
        .where(ubound >= alpha)
        .select("id_a", "id_b")
    )
    vcol = "_gid" if use_ids else "_g"
    ga = ordered.select(
        F.col("_id").alias("id_a"), F.col(vcol).alias("ga"),
        F.size("_g").alias("__na"),
    )
    gb = ordered.select(
        F.col("_id").alias("id_b"), F.col(vcol).alias("gb"),
        F.size("_g").alias("__nb"),
    )
    if broadcast_cands:
        cands = F.broadcast(cands)
    pairs = cands.join(ga, "id_a").join(gb, "id_b")

    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    # |A ∪ B| = |A| + |B| − |A ∩ B| exactly (both arrays are distinct
    # sets by construction — rebuilt from distinct (id, token) rows), so
    # the hash-set build of array_union is pure overhead next to the
    # arithmetic: verify measured 8.9 s → 6.6 s at sf0.1 / 667k
    # candidates when it was dropped (round 9)
    union = (F.col("__na") + F.col("__nb")).cast("double") - inter
    kept = pairs.where(inter / union >= threshold)
    if return_counts:
        return kept.select(
            "id_a",
            "id_b",
            inter.cast("long").alias("n_i"),
            union.cast("long").alias("n_u"),
        ).dropDuplicates(["id_a", "id_b"])
    if return_similarity:
        return kept.select(
            "id_a", "id_b", F.round(inter / union, 6).alias("jac")
        ).dropDuplicates(["id_a", "id_b"])
    return kept.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])


def containment_scores(
    corpus_grams: DataFrame,
    bench_grams: DataFrame,
    min_containment: float = 0.3,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    gram_col: str = "gram",
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT |B ∩ A| / |B| of each benchmark doc
    B in each corpus doc A — the decontamination score (GPT-3 appendix C
    measures 13-gram overlap against eval sets; q_decontaminate's shared-
    gram FLAG is the cheap gate, this is the normalized score you rank
    and audit).  Jaccard is the wrong metric here: a benchmark item
    quoted inside a much longer document has tiny Jaccard but containment
    ~1.

    Inputs are exploded (id, gram) frames with DISTINCT grams per doc.
    Plan: benchmark gram counts stage once (the benchmark side is small
    by contract and broadcasts); candidates meet in an equi-join ON THE
    GRAM — never a cartesian — and one partial-agged groupBy per
    (corpus doc, bench doc) counts shared grams.  The score is one
    deterministic double division of exact longs."""
    bsize = bench_grams.groupBy(bench_id_col).agg(
        F.count(F.lit(1)).alias("__bsize")
    )
    b = bench_grams.join(bsize, bench_id_col)
    shared = (
        corpus_grams.join(F.broadcast(b), gram_col)
        .groupBy(id_col, bench_id_col, "__bsize")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    containment = F.col("shared_grams").cast("double") / F.col("__bsize")
    return (
        shared.select(
            id_col, bench_id_col, "shared_grams", containment.alias("containment")
        )
        .where(F.col("containment") >= min_containment)
    )
