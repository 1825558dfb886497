"""Retrieval compositions past single-list BM25: positional phrase search
and reciprocal-rank fusion of lexical + dense candidate lists.

Both are first-class pieces of the LLM-data/RAG stack the engine targets:

* ``phrase_search`` — exact multi-word phrase lookup over a positional
  inverted index. The reference's search surface is term-level only
  (BigQuery LIKE filters over statement text); position-aware matching is
  the standard inverted-index extension (Manning et al., IIR ch. 2).
* ``rrf_fuse`` — Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
  SIGIR 2009): combine per-query rank lists from heterogeneous retrievers
  (BM25, embedding k-NN, ...) by summing 1/(rrf_k + rank). The standard
  hybrid-search merge — rank-only, so wildly different score scales fuse
  without calibration.

Scale shape: phrase matching is one broadcast equi-join on TERM (only
postings of query-phrase terms survive the probe — the inverted-index
contract) plus one partial-aggregated groupBy keyed by candidate
occurrence; fusion is a union of tiny per-leg top-k lists followed by a
groupBy on (query, doc). Nothing touches the corpus twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def positional_postings(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per token occurrence: (id, pos, term), pos 0-based.

    posexplode keeps the token's offset — the positional inverted index a
    phrase query needs. At warehouse scale this frame is what you persist
    (partitioned by term-hash bucket); here it is built inline."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    ).where(F.col("term") != "")


def phrase_search(
    docs: DataFrame,
    phrases: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase occurrences: one row per (phrase_id, doc) with the
    occurrence count and the first match position.

    ``phrases`` is a tiny (phrase_id, phrase) frame. A phrase of n terms
    [t0..t(n-1)] occurs at start s iff every offset j finds t_j at s+j —
    relationally: join postings to the broadcast (phrase_id, off, term)
    list on TERM, derive the implied start ``pos - off``, and keep
    (phrase_id, doc, start) groups where all n offsets matched. Repeated
    terms inside a phrase are handled by counting DISTINCT offsets, not
    rows. One broadcast join + one groupBy; candidate group cardinality is
    bounded by term-match counts, not corpus size.
    """
    post = positional_postings(docs, id_col=id_col, text_col=text_col)
    pterms = phrases.select(
        "phrase_id",
        F.posexplode(F.split(F.col("phrase"), " ")).alias("off", "term"),
        F.size(F.split(F.col("phrase"), " ")).alias("n_terms"),
    ).where(F.col("term") != "")
    occ = (
        post.join(F.broadcast(pterms), "term")
        .groupBy("phrase_id", id_col, (F.col("pos") - F.col("off")).alias("start"))
        .agg(
            F.count_distinct("off").alias("matched"),
            F.max("n_terms").alias("n_terms"),
        )
        .where((F.col("matched") == F.col("n_terms")) & (F.col("start") >= 0))
    )
    return occ.groupBy("phrase_id", id_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("start").alias("first_pos"),
    )


def rrf_fuse(
    legs: list[DataFrame],
    *,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rrf_k: int = 60,
    topn: int = 10,
) -> DataFrame:
    """Fuse per-query rank lists into one: RRF(d) = Σ_legs 1/(rrf_k + r).

    Each leg carries (query, doc, rank) for its own top-k. Legs are
    union-tagged and collapsed with one groupBy; per-leg ranks come back
    as conditional-min columns (``rank_0``, ``rank_1``, ...), and the
    score is a single left-to-right IEEE expression over them — the same
    expression a SQL oracle writes, so fused scores are bit-identical
    cross-engine (no float summation-order ambiguity: leg order is fixed
    in the expression tree, not data-dependent).

    Output: (query, doc, rrf round-9, rank_i per leg, fused row_number
    ``rank`` by score desc / doc asc) — top ``topn`` rows per query.
    """
    from pyspark.sql.window import Window

    tagged = None
    for i, leg in enumerate(legs):
        t = leg.select(
            F.col(query_col),
            F.col(id_col),
            F.lit(i).alias("_leg"),
            F.col(rank_col).alias("_r"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    per_leg = [
        F.min(F.when(F.col("_leg") == i, F.col("_r"))).alias(f"rank_{i}")
        for i in range(len(legs))
    ]
    fused = tagged.groupBy(query_col, id_col).agg(*per_leg)
    score = None
    for i in range(len(legs)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    w = Window.partitionBy(query_col).orderBy(F.desc("rrf"), F.asc(id_col))
    return (
        fused.withColumn("rrf", F.round(score, 9))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topn)
    )


def rbo_suffix_weights(p: float = 0.9, depth: int = 10, scale: int = 10**12) -> list[int]:
    """Fixed-point suffix sums of the truncated RBO weight series.

    ``S[m] = Σ_{d=m..depth} (1-p)·p^(d-1)/d`` scaled to integers, so a
    common document first present in both lists at depth ``m`` contributes
    exactly ``S[m]`` to the rank-biased overlap (Webber, Moffat & Zobel,
    TOIS 2010 — truncated/prefix form). Integer literals are embedded in
    BOTH engines' plans, so per-query scores are exact long sums — no
    engine-ordered float folds.
    """
    s = [0.0] * (depth + 2)
    for m in range(depth, 0, -1):
        s[m] = s[m + 1] + (1.0 - p) * p ** (m - 1) / m
    return [round(v * scale) for v in s[1 : depth + 1]]


def rbo_agreement(
    leg_a: DataFrame,
    leg_b: DataFrame,
    *,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    p: float = 0.9,
    depth: int = 10,
) -> DataFrame:
    """Truncated rank-biased overlap between two per-query top-``depth``
    rank lists — the retriever-agreement diagnostic next to ``rrf_fuse``
    (high RBO ⇒ the legs are redundant; low ⇒ fusion adds recall).

    Uses the common-document suffix-sum identity: overlap@d counts the
    common docs with ``max(rank_a, rank_b) <= d``, so
    ``RBO = Σ_common S[max(ra, rb)]`` with ``S`` from
    :func:`rbo_suffix_weights`. One equi-join on (query, doc) between two
    depth-sized lists + one groupBy on the query — never rescans the
    corpus, never compares rankings pairwise per depth.
    """
    scale = 10**12
    weights = rbo_suffix_weights(p, depth, scale)
    warr = F.array(*[F.lit(w) for w in weights])
    a = leg_a.where(F.col(rank_col) <= depth).select(
        query_col, id_col, F.col(rank_col).alias("__ra")
    )
    b = leg_b.where(F.col(rank_col) <= depth).select(
        query_col, id_col, F.col(rank_col).alias("__rb")
    )
    common = a.join(b, [query_col, id_col]).select(
        query_col,
        F.element_at(warr, F.greatest("__ra", "__rb").cast("int")).alias("__w"),
    )
    qs = a.select(query_col).distinct()
    per_q = common.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("overlap"),
        F.sum("__w").alias("__wsum"),
    )
    return (
        qs.join(per_q, query_col, "left")
        .select(
            query_col,
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
            F.round(
                F.coalesce("__wsum", F.lit(0)).cast("double") / F.lit(float(scale)), 9
            ).alias("rbo"),
        )
        .orderBy(query_col)
    )


def mmr_rerank(
    cand: DataFrame,
    pairs: DataFrame,
    *,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "rel",
    pair_a: str = "a",
    pair_b: str = "b",
    sim_col: str = "s",
    m: int = 5,
    lam: float = 0.7,
    mu: float = 0.3,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): greedily pick ``m`` of each query's candidates, each step
    maximizing ``lam·rel − mu·max_sim_to_already_selected`` — the
    diversity cut between retrieval and the context window (top-k alone
    returns five near-copies of the best hit; MMR returns one plus four
    genuinely different ones).

    The greedy loop is unrolled into ``m`` relational steps (the k-means/
    PageRank discipline: a sequential algorithm becomes oracle-checkable
    when each iteration is the same algebra), each an anti-join (remaining
    candidates) + an equi-join onto the selected set's pairwise sims + one
    argmax window. Everything is candidate-list-sized — the corpus is
    never rescanned. ``lam``/``mu`` are SEPARATE literals (not mu=1−lam:
    Python's 1−0.7 is 0.30000000000000004, which would silently diverge
    from the oracle's 0.3).
    """
    # Lineage cuts are load-bearing: each unrolled step references the
    # prior selection three times (anti-join, sim join, union), so without
    # them the plan re-derives cand/pairs O(3^m) times (the BPE chained-HOF
    # lesson — measured 23 s -> ~2 s at sf0.01 for m=5).
    cand = cand.localCheckpoint(eager=False)
    w1 = W.partitionBy(query_col).orderBy(F.desc(rel_col), F.asc(id_col))
    selected = (
        cand.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") == 1)
        .select(query_col, id_col, F.lit(1).alias("step"), F.col(rel_col))
    )
    psel = pairs.select(
        F.col(query_col),
        F.col(pair_a).alias(id_col),
        F.col(pair_b).alias("__sel_id"),
        F.col(sim_col).alias("__s"),
    ).localCheckpoint(eager=False)
    for k in range(2, m + 1):
        selected = selected.localCheckpoint(eager=False)
        sel_ids = selected.select(query_col, id_col)
        rem = cand.join(sel_ids, [query_col, id_col], "left_anti")
        scored = (
            rem.join(psel, [query_col, id_col])
            .join(
                sel_ids.withColumnRenamed(id_col, "__sel_id"),
                [query_col, "__sel_id"],
            )
            .groupBy(query_col, id_col, rel_col)
            .agg(F.max("__s").alias("__ms"))
            .withColumn(
                "__mmr", F.lit(lam) * F.col(rel_col) - F.lit(mu) * F.col("__ms")
            )
        )
        wk = W.partitionBy(query_col).orderBy(F.desc("__mmr"), F.asc(id_col))
        pick = (
            scored.withColumn("__rn", F.row_number().over(wk))
            .where(F.col("__rn") == 1)
            .select(query_col, id_col, F.lit(k).alias("step"), F.col(rel_col))
        )
        selected = selected.unionByName(pick)
    return selected.orderBy(query_col, "step")
