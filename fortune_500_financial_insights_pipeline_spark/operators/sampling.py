"""Sampling operators for training-data pipelines (SURVEY.md §2.11 family):
uniform, stratified, and deterministic hash-based row sampling.

``df.sample`` is fast but partition-order dependent — re-running after a
repartition yields a different subset, which poisons reproducible dataset
builds. ``hash_sample`` keys the decision on a row identity hash instead:
the same rows are selected no matter the partitioning, cluster size, or
Spark version, and the sample composes with incremental loads (a row's
in/out decision never changes). That property is what a 100 TB corpus
refresh needs: yesterday's 1% sample is a subset of today's."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# xxhash64 yields a uniform signed 64-bit value; bucket it into [0, 1)
_HASH_BUCKETS = 1_000_000


def hash_sample(df: DataFrame, fraction: float, key_cols: list[str], seed: int = 0) -> DataFrame:
    """Deterministic content-keyed sample: keep rows whose key-hash bucket
    falls below ``fraction``. Same keys in → same rows out, always."""
    bucket = F.pmod(F.xxhash64(*key_cols, F.lit(seed)), F.lit(_HASH_BUCKETS))
    return df.filter(bucket < int(fraction * _HASH_BUCKETS))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum sampling fractions (class rebalancing): thin wrapper over
    the native ``sampleBy`` (Bernoulli per row, seeded)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def _hex_threshold(fraction: float) -> str:
    """``fraction`` of the md5 space as a 32-digit lowercase hex string.
    Fixed-width lowercase hex compares byte-wise exactly like the number
    it spells, so `md5(key) < threshold` is a pure string predicate any
    engine evaluates identically — that is what makes md5_sample
    oracle-checkable where xxhash64 (Spark-specific) is not."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return format(int(fraction * (1 << 128)), "032x")[:32]


def md5_sample(df: DataFrame, fraction: float, key_cols: list[str]) -> DataFrame:
    """Deterministic, engine-portable content-keyed sample: keep rows whose
    md5 over the '|'-joined keys lands in the first ``fraction`` of hash
    space. Same reproducibility contract as hash_sample (partition- and
    version-invariant, supersets compose across fractions) with ~2x the
    per-row hashing cost of xxhash64 — the price of portability."""
    key = F.md5(F.concat_ws("|", *key_cols))
    return df.filter(key < F.lit(_hex_threshold(fraction)))


def md5_stratified(
    df: DataFrame, strata_col: str, fractions: dict[str, float], key_cols: list[str]
) -> DataFrame:
    """Deterministic per-stratum sampling (class rebalancing without
    sampleBy's seeded-Bernoulli engine dependence): each stratum gets its
    own md5-space threshold via a CASE chain; strata absent from
    ``fractions`` are dropped (empty threshold sorts below every hash)."""
    case = None
    for stratum, frac in fractions.items():
        arm = (F.col(strata_col) == stratum, F.lit(_hex_threshold(frac)))
        case = F.when(*arm) if case is None else case.when(*arm)
    threshold = case.otherwise(F.lit(""))
    return df.filter(F.md5(F.concat_ws("|", *key_cols)) < threshold)


def split_assign(
    df: DataFrame, key_cols: list[str], splits: dict[str, float]
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5 over the keys lands
    in consecutive hash-space bands, one per split (in ``splits`` order, so
    {'train': .8, 'val': .1, 'test': .1} gives train=[0,.8), val=[.8,.9),
    test=[.9,1)).  Same engine-portability contract as md5_sample: the
    assignment is a pure string comparison, invariant to partitioning,
    cluster size, engine, and incremental loads — a doc never migrates
    between splits across corpus refreshes, which is what keeps eval sets
    uncontaminated release over release."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    key = F.md5(F.concat_ws("|", *key_cols))
    names = list(splits)
    case = None
    cum = 0.0
    for name in names[:-1]:
        # round the running sum so 0.8 + 0.1 -> 0.9 exactly: the oracle
        # spells the band edge as _hex_threshold(0.9), and a 1-ulp float
        # drift here would move the edge by a few hash values
        cum = round(cum + splits[name], 12)
        arm = (key < F.lit(_hex_threshold(cum)), F.lit(name))
        case = F.when(*arm) if case is None else case.when(*arm)
    assigned = case.otherwise(F.lit(names[-1])) if case is not None else F.lit(names[-1])
    return df.withColumn("split", assigned)


def mix_sources(
    docs: DataFrame,
    weights: dict[str, int],
    *,
    budget_fraction: float | None = None,
    budget_tokens: int | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Weighted source mixing to a token budget — the "data mixture" step
    of a training-data build (e.g. web 60% / code 20% / books 20% of an
    N-token target). Integer ``weights`` split the total budget
    proportionally: ``budget(s) = (w_s * total) div sum(w)`` in exact
    long arithmetic; the total is ``budget_tokens`` or
    ``floor(budget_fraction * corpus_tokens)`` with the corpus total
    entering as a 1-row broadcast, never a driver collect.

    Within each source, documents are ordered by ``(md5(id), id)`` — the
    engine-portable deterministic shuffle used across this repo — and the
    kept set is the longest PREFIX whose running token count fits the
    source's budget (prefix truncation: the first overflowing doc and
    everything after it are cut; no skip-and-refill, so the selection is a
    pure predicate on the running sum and replays identically in any
    engine). Output: kept docs with ``n_tokens``, running ``cum_tokens``,
    and the source's ``budget``.

    100 TB shape: one window keyed by source — low cardinality by nature
    (sources are datasets, not rows), so a hot source serializes in one
    task. When a single source is itself huge, pre-aggregate the running
    sum at file/shard granularity first (shard prefix sums broadcast,
    per-shard windows then run in parallel) — same semantics, two-level
    scan; at fixture scale the single window is the honest plan."""
    from pyspark.sql.window import Window

    spark = docs.sparkSession
    if (budget_fraction is None) == (budget_tokens is None):
        raise ValueError("exactly one of budget_fraction / budget_tokens required")
    sum_w = sum(int(w) for w in weights.values())
    wdf = spark.createDataFrame(
        [(s, int(w)) for s, w in sorted(weights.items())],
        f"{source_col} string, weight bigint",
    )
    t = docs.select(
        F.col(id_col),
        F.col(source_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    if budget_tokens is not None:
        total = spark.range(1).select(
            F.lit(int(budget_tokens)).cast("long").alias("total_budget")
        )
    else:
        total = t.agg(
            F.floor(F.sum("n_tokens") * F.lit(float(budget_fraction)))
            .cast("long")
            .alias("total_budget")
        )
    budgets = (
        wdf.crossJoin(F.broadcast(total))
        .select(
            source_col,
            F.expr(f"(weight * total_budget) div {sum_w}").alias("budget"),
        )
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(F.broadcast(budgets), source_col)
        .where(F.col("cum_tokens") <= F.col("budget"))
        .select(id_col, source_col, "n_tokens", "cum_tokens", "budget")
    )


def upsample_sources(
    docs: DataFrame,
    factors: dict[str, float],
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source epoch upsampling — the repetition half of data mixing
    (mix_sources truncates down; this repeats up, e.g. "2.5 epochs of
    books, 1 epoch of web"). Each doc emits ``floor(factor)`` full copies
    plus one extra for the deterministic md5-prefix fraction of docs that
    covers the fractional part, so a source with factor 2.5 repeats every
    doc twice and exactly the first half of md5 space a third time.
    Output: one row per (doc, epoch), epoch counting from 0.

    The fractional threshold is computed driver-side (_hex_threshold) and
    enters the plan as a string literal, so the copy decision is a pure
    md5-prefix predicate any engine replays byte-for-byte. The explode is
    guarded by ``n_copies >= 1`` — ``sequence(0, -1)`` would walk
    DESCENDING (Spark defaults step=-1 when start > stop, the
    q_char_entropy lesson) instead of emitting nothing.

    100 TB shape: copies are rows out of a projection+explode (no shuffle,
    no driver traffic); the per-source parameters ride a broadcast
    dim-sized table. Downstream shuffles see the amplified row count —
    apply this AFTER filtering/dedup, immediately before sequence packing."""
    spark = docs.sparkSession
    params = []
    for s, f in sorted(factors.items()):
        if f < 0:
            raise ValueError(f"factor for {s!r} must be >= 0")
        full = int(f)
        params.append((s, full, _hex_threshold(f - full)))
    pdf = spark.createDataFrame(
        params, f"{source_col} string, full_epochs int, th string"
    )
    n_copies = F.col("full_epochs") + F.when(
        F.md5(F.col(id_col).cast("string")) < F.col("th"), 1
    ).otherwise(0)
    return (
        docs.select(id_col, source_col)
        .join(F.broadcast(pdf), source_col)
        .withColumn("n_copies", n_copies)
        .where(F.col("n_copies") >= 1)
        .select(
            id_col,
            source_col,
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("epoch"),
        )
        .select(id_col, source_col, F.col("epoch").cast("long").alias("epoch"))
    )


def hash_shards(df: DataFrame, key_cols: list[str], n_shards: int) -> DataFrame:
    """Deterministic shard assignment for sharded dataset export: adds
    ``shard`` = md5-hash of the '|'-joined keys mod ``n_shards``.

    The export half of the training-data story: a 100 TB curated corpus
    ships as N self-contained shards, and the assignment must be (a)
    uniform — md5 is, regardless of key skew, (b) stable across reruns,
    partitionings and engines — same portability contract as md5_sample,
    so a resumed or incremental export never moves a document between
    shards, and (c) computable map-side with no shuffle — the subsequent
    ``write.partitionBy('shard')`` (or repartition('shard') for one file
    per shard) is the only exchange."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", *key_cols)), 1, 15), 16, 10
    ).cast("long")
    return df.withColumn("shard", (h % n_shards).cast("int"))


def weighted_sample(
    df: DataFrame, weight_col: str, key_cols: list[str], n: int
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: top-n rows by
    the Efraimidis–Spirakis key u^(1/w) (Inf. Proc. Letters 97(5), 2006),
    with u an md5-derived uniform in [0, 1) over the row identity.

    Selection probability is proportional to weight (a doc with twice the
    weight is twice as likely in), but the draw is a pure function of the
    row keys — partition-invariant, rerun-stable, engine-portable: the
    quality-weighted corpus selection a reproducible training-data build
    needs, where `df.sample` or rand()-keyed draws shuffle membership on
    every retry. Plan shape: map-side score + TakeOrdered(n) — no shuffle,
    no window, driver holds n rows only.

    The score is rounded to 6 decimals before ranking (pow() may differ in
    the last ulp across libm implementations) and tie-broken on the keys,
    so the selected set is total-order deterministic across engines.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    u = (
        F.conv(F.substring(F.md5(F.concat_ws("|", *key_cols)), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    )
    score = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 6)
    return (
        df.withColumn("es_score", score)
        .orderBy(F.desc("es_score"), *[F.asc(c) for c in key_cols])
        .limit(n)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    key_cols: list[str],
    n_per_group: int,
) -> DataFrame:
    """Per-group weighted sampling without replacement: ``weighted_sample``
    with an n-quota per group (top-n by the Efraimidis–Spirakis key within
    each group) — the per-source quality-weighted selection a data-mixture
    build runs ("keep the best-weighted 100k docs from EACH source").

    Plan shape: map-side score, then a rank the optimizer caps with a
    WindowGroupLimit partial — each input partition ships at most
    ``n_per_group`` rows per group into the exchange, so the shuffle is
    O(n·groups·partitions) no matter how skewed the source sizes are
    (same property test_plan_quality pins for q_source_cap)."""
    if n_per_group <= 0:
        raise ValueError("n_per_group must be positive")
    from pyspark.sql import Window as W

    u = (
        F.conv(F.substring(F.md5(F.concat_ws("|", *key_cols)), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    )
    score = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 6)
    w = W.partitionBy(*group_cols).orderBy(
        F.desc("es_score"), *[F.asc(c) for c in key_cols]
    )
    return (
        df.withColumn("es_score", score)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def epoch_shuffle(
    df: DataFrame, key_cols: list[str], *, n_shards: int, epoch: int = 0
) -> DataFrame:
    """Reproducible global epoch shuffle for training-data loading: adds
    ``shard`` (md5 of the keys mod ``n_shards``, same contract as
    ``hash_shards``) and ``pos`` — the row's position within its shard
    under an epoch-salted md5 order. (shard, pos) is a total order over
    the corpus; changing ``epoch`` re-salts the order key, yielding a
    fresh deterministic permutation per epoch with no RNG state, no
    central shuffle service, and no driver involvement.

    Why not one global row_number: an unpartitioned window funnels the
    corpus through a single partition. Per-shard numbering keeps every
    window partition at corpus/n_shards rows while still defining a global
    order (loaders read shards round-robin or in parallel — exactly how
    sharded training datasets are consumed). The md5 order key is uniform,
    so shards AND positions are balanced regardless of key skew.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    from pyspark.sql import Window as W

    key = F.concat_ws("|", *key_cols)
    order_key = F.md5(F.concat_ws("|", F.lit(str(epoch)), key))
    w = W.partitionBy("shard").orderBy(F.asc("__ek"), *[F.asc(c) for c in key_cols])
    return (
        hash_shards(df, key_cols, n_shards)
        .withColumn("__ek", order_key)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__ek")
    )
