"""Distributed BPE tokenizer training (Sennrich, Haddow, Birch, "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016) — the
vocabulary-learning step of an LLM data pipeline, next to the token
*counting* operators/text.py already covers.

Structure matters more than the merge loop: BPE trains on the WORD
FREQUENCY table, not the raw corpus. The only corpus-sized pass is the
initial word count (one partial-aggregated groupBy); every Lloyd-style
iteration after that — pair counting, argmax, merge application — runs on
the distinct-word vocabulary, which is orders of magnitude smaller than a
100 TB corpus and shrinks further as merges coalesce symbols. Per
iteration: ONE vocabulary-sized shuffle (the pair-count aggregate) and one
1-row collect (the winning pair); the merge itself is a map-side
higher-order-function projection, no shuffle, no UDF.

Determinism: the winning pair breaks ties by (count DESC, lhs ASC, rhs
ASC); merge application is standard leftmost-non-overlapping greedy,
implemented as an exact fold — so the whole training trajectory is
reproducible and hash-checkable against a SQL oracle that replays the
iterations with relational windows (gaps-islands parity for the
overlapping-run case, e.g. 'aaa' + merge (a,a) → ['aa','a']).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-sized pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_indices(syms: Column) -> Column:
    """Indices i (1-based) of adjacent pairs (s[i], s[i+1]). Guarded:
    sequence(1, 0) in Spark counts DOWN to [1, 0] — single-symbol words
    must yield an empty array, not phantom sites."""
    n = F.size(syms)
    return F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )


def _merge_once(syms: Column, lhs: str, rhs: str) -> Column:
    """Apply one merge (lhs, rhs) → lhs||rhs leftmost-non-overlapping.

    Overlaps only arise when lhs == rhs (a run like 'aaa'); the fold keeps
    a site only if the previous site index wasn't just consumed — exact
    greedy semantics, all JVM-side HOFs, constant work per symbol."""
    a, b = F.lit(lhs), F.lit(rhs)
    sites = F.filter(
        _pair_indices(syms),
        lambda i: (F.element_at(syms, i) == a) & (F.element_at(syms, i + 1) == b),
    )
    kept = F.aggregate(
        sites,
        F.struct(
            F.array().cast("array<int>").alias("arr"),
            F.lit(-5).cast("int").alias("last"),
        ),
        lambda acc, s: F.when(s == acc["last"] + 1, acc).otherwise(
            F.struct(
                F.concat(acc["arr"], F.array(s)).alias("arr"),
                s.cast("int").alias("last"),
            )
        ),
        lambda acc: acc["arr"],
    )
    rebuilt = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(syms)),
            lambda i: F.when(
                F.array_contains(kept, i),
                F.concat(F.element_at(syms, i), F.element_at(syms, i + 1)),
            ).otherwise(
                F.when(F.array_contains(kept, i - 1), F.lit(None)).otherwise(
                    F.element_at(syms, i)
                )
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return rebuilt


def _select_disjoint_batch(
    candidates: list[tuple[str, str, int]], want: int
) -> list[tuple[str, str, int]]:
    """Greedy selection of up to ``want`` candidates in rank order whose
    symbol NEIGHBORHOODS are fully disjoint — PRODUCT-aware: a candidate
    is rejected when its lhs/rhs equals the concatenation an
    already-selected pair produces (it would consume tokens created
    inside this same batch), or when its own concatenation equals a
    symbol an already-selected pair consumes or produces (its product
    would have fed an earlier-ranked merge). With products fenced off,
    merges in a batch cannot create, destroy, or share adjacency sites
    with each other in ANY order of application, so the snapshot
    pair_counts and selection ranks are exactly the sequential
    (batch_size=1) semantics."""
    used: set[str] = set()
    produced: set[str] = set()
    batch: list[tuple[str, str, int]] = []
    for lhs, rhs, cnt in candidates:
        concat = lhs + rhs
        if lhs in used or rhs in used or concat in used:
            continue
        if lhs in produced or rhs in produced or concat in produced:
            continue
        batch.append((lhs, rhs, cnt))
        used.update((lhs, rhs))
        produced.add(concat)
        if len(batch) >= want:
            break
    return batch


def bpe_train(
    docs: DataFrame,
    *,
    n_merges: int,
    text_col: str = "text",
    batch_size: int = 1,
    stats: dict | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (step, lhs, rhs, pair_count) — the artifact a tokenizer ships.

    ``batch_size=1`` is exact sequential BPE (one merge per pair-count
    snapshot — the oracle-replayed form).  ``batch_size=m`` selects the
    top-m SYMBOL-DISJOINT pairs per snapshot (product-aware: a pair whose
    lhs/rhs collides with another selected pair's concatenation — or vice
    versa — is deferred to the next snapshot, see
    :func:`_select_disjoint_batch`) and applies them together:
    because disjoint pairs cannot create, destroy, or share adjacency
    sites with each other, their snapshot counts are exactly what
    sequential application would have seen — the standard batching trick
    that takes a 32k-merge production tokenizer from 32k driver
    round-trips to ~hundreds.  The one divergence from strict-sequential
    BPE: a pair CREATED by an earlier in-batch merge (e.g. ('ab', 'c')
    right after ('a','b')) can't be picked until the next snapshot, so a
    batched run may order merges slightly differently; vocabularies of
    real corpora are insensitive to this (same trade fast BPE trainers
    make).

    Driver traffic is one top-(4·batch) collect per iteration; the
    vocabulary frame is checkpointed between iterations so each batch is
    applied once, not replayed through lineage.  Pass ``stats={}`` to get
    ``stats['iterations']`` (snapshot jobs run) back."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    spark = docs.sparkSession
    words = (
        word_frequencies(docs, text_col=text_col)
        .select("word", "cnt", F.split("word", "").alias("s"))
        .persist()
    )
    merges: list[tuple[int, str, str, int]] = []
    iterations = 0
    try:
        while len(merges) < n_merges:
            pairs = (
                words.select(
                    "cnt",
                    F.explode(_pair_indices(F.col("s"))).alias("i"),
                    F.col("s"),
                )
                .select(
                    "cnt",
                    F.element_at("s", F.col("i")).alias("lhs"),
                    F.element_at("s", F.col("i") + 1).alias("rhs"),
                )
                .groupBy("lhs", "rhs")
                .agg(F.sum("cnt").alias("pair_count"))
            )
            want = min(batch_size, n_merges - len(merges))
            # over-fetch 4× so disjointness filtering still fills the batch
            top = (
                pairs.orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
                .limit(max(want * 4, 8))
                .collect()
            )
            iterations += 1
            if not top:
                break  # vocabulary fully merged — nothing adjacent remains
            batch = _select_disjoint_batch(
                [(str(r["lhs"]), str(r["rhs"]), int(r["pair_count"])) for r in top],
                want,
            )
            nxt = words
            for lhs, rhs, cnt in batch:
                merges.append((len(merges) + 1, lhs, rhs, cnt))
                # lazy checkpoint per stage: keeps each merge's expression
                # tree one level deep (_merge_once nests its input ~8×, so
                # an uncut chain costs exponential driver analysis —
                # measured in bpe_segment before the same fix); blocks
                # materialize together on the next snapshot job
                nxt = nxt.withColumn(
                    "s", _merge_once(F.col("s"), lhs, rhs)
                ).localCheckpoint(eager=False)
            nxt = nxt.localCheckpoint()
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    if stats is not None:
        stats["iterations"] = iterations
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_count bigint"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge list: (id, token, n) token counts per
    document.

    Merges are applied to the DISTINCT-WORD vocabulary, not per word
    occurrence, and tokenization becomes a broadcast dictionary join —
    the same corpus/vocabulary split as training. This matters twice at
    scale: the chained merge expressions run |vocab| times instead of
    |corpus| times, and chained HOF stages nest the previous stage's
    expression tree several times over (measured: per-occurrence
    application was ~50× slower at fixture scale purely from expression
    blowup — the dictionary join removed it)."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).where(F.col("word") != "")
    # One projection PER MERGE over a named column — chaining the merge
    # expressions directly nests the previous stage's tree ~8× per level
    # (exponential: measured minutes of driver-side analysis at depth 3,
    # data-size-invariant). Named-column stages keep each tree one merge
    # deep; localCheckpoint pins the vocabulary tiny and cuts the lineage
    # so Catalyst cannot re-inline the stages.
    segmented = words.select("word").distinct().select(
        "word", F.split(F.col("word"), "").alias("s")
    )
    for lhs, rhs in merges:
        segmented = segmented.select(
            "word", _merge_once(F.col("s"), lhs, rhs).alias("s")
        ).localCheckpoint(eager=False)
    return (
        words.join(F.broadcast(segmented), "word")
        .select(F.col(id_col), F.explode("s").alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
