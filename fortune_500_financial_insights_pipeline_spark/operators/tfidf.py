"""TF-IDF term weighting over a documents table (SURVEY.md §2.11 text
analysis; the reference delegates all text analytics downstream — this is
the training-data-pipeline counterpart).

Plan shape (the 100 TB-relevant part):
- one posexplode + groupBy(doc, term) → term frequencies (single shuffle,
  partial aggregation map-side);
- document frequency is a second aggregation OVER THE TF FRAME (already
  one row per (doc, term), so df = count per term — no second pass over
  raw text);
- corpus size N enters as a 1-row broadcast cross-join, never a driver
  collect;
- idf joins back on `term`, a key whose cardinality is the vocabulary —
  AQE picks broadcast when the vocabulary is small, shuffle-hash when not.

idf = ln((1+N)/(1+df)) (smoothed); tfidf is rounded to 6 decimals so the
value is stable across libm implementations (Spark JVM vs oracle engines
may differ in the last ulp of ln).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def term_frequencies(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf) — whitespace tokens, duplicate-counting.

    The tokenize/explode is guarded by ensure_min_parallelism: a compact
    single-file corpus would otherwise run it on one scan task (results are
    doc-keyed aggregates — partition-invariant by construction)."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    src = ensure_min_parallelism(
        docs.select(F.col(id_col), F.col(text_col)), id_col
    )
    toks = F.explode(F.split(F.col(text_col), " ")).alias("term")
    return (
        src.select(F.col(id_col), toks)
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
    checkpoint_tf: bool = False,
) -> DataFrame:
    """(doc_id, term, tf, tfidf) with smoothed idf; optionally keep only
    the top_k highest-weight terms per document (ties broken by term).

    ``checkpoint_tf`` (round 9, guide §5): lazily materialize the
    term-frequency frame — the ``tfidf_from_tf`` story ("a pipeline can
    afford one write") applied in-session: warm executions weight the
    postings instead of re-tokenizing the corpus. Value-neutral."""
    tf = term_frequencies(docs, id_col=id_col, text_col=text_col)
    if checkpoint_tf:
        tf = tf.localCheckpoint(eager=False)
    # document frequency as a window over the TF frame: tf already has one
    # row per (doc, term), so count(*) over (partition by term) IS df. A
    # separate tf.groupBy("term") branch would recompute the explode —
    # two full passes over the raw text (verified in the physical plan).
    from pyspark.sql.window import Window

    df_w = Window.partitionBy("term")
    n = docs.select(F.count("*").alias("n_docs"))
    weighted = (
        tf.withColumn("df", F.count("*").over(df_w))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))),
                6,
            ),
        )
        .select(id_col, "term", "tf", "tfidf")
    )
    if top_k is None:
        return weighted
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        weighted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .drop("rn")
    )


def tfidf_from_tf(tf: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """TF-IDF from an already-MATERIALIZED term-frequency frame (parquet
    or checkpoint) — the 100 TB path.

    The one-shot `tfidf()` derives df with a window over `term` to keep a
    single pass over raw text; that window's partitions are per-term, and
    stopword terms appear in nearly every document — billions of buffered
    rows per hot key at corpus scale. When tf is materialized (a pipeline
    can afford one write), df becomes a partially-aggregated groupBy —
    skew-free map-side combine — and the join back is on the aggregated
    vocabulary, which AQE broadcasts when small.

    N is countDistinct(doc) over tf: identical to `tfidf()`'s docs.count()
    unless the corpus contains token-less documents (which contribute no
    tf rows and receive no terms either way).
    """
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = tf.select(F.countDistinct(id_col).alias("n_docs"))
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))),
                6,
            ),
        )
        .select(id_col, "term", "tf", "tfidf")
    )


def sparse_cosine_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sim: float = 0.3,
    max_df_ratio: float = 0.5,
    scale: int = 10_000,
) -> DataFrame:
    """Sparse TF-IDF cosine similarity pairs: (id_a, id_b, cos_sim) with
    id_a < id_b and cos_sim >= ``min_sim`` — the LEXICAL-vector member of
    the near-dup family (exact n-gram Jaccard catches verbatim overlap,
    dense embedding cosine catches semantics; TF-IDF cosine catches
    shared *vocabulary emphasis*, the classic IR document similarity).

    Deterministic by the repo's fixed-point discipline: round-6 tfidf
    weights scale to 1e4 fixed-point longs, so per-document norms and
    per-pair dot products are EXACT integer sums under any partitioning
    (headroom: wf <= ~6e6 per term keeps a 300-term document's moment sum
    below 1e16 << 2^63; the final long→double casts round half-even
    identically in every IEEE engine). The cosine itself is one
    fixed-text double expression, rounded to 6dp, and the threshold
    filter runs on the ROUNDED value so both engines keep identical
    pair sets.

    Scale shape: candidates meet on `term` — an equi-join whose fan-out
    is bounded by two guards: zero-weight terms drop out (a term in every
    document has idf 0), and ``max_df_ratio`` drops near-ubiquitous terms
    outright (df > ratio·N — standard IR stopword cut; such terms carry
    almost no tfidf weight but would each fan out O(df²) join rows). No
    O(n²) path: the join is vocabulary-keyed, pairs sharing several terms
    collapse in one (id_a, id_b) partial-aggregated groupBy."""
    w = tfidf(docs, id_col=id_col, text_col=text_col)
    n = docs.select(F.count("*").alias("n_docs"))
    dfreq = w.groupBy("term").agg(F.count("*").alias("df"))
    wf = (
        w.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .where(F.col("df") <= max_df_ratio * F.col("n_docs"))
        .select(
            F.col(id_col),
            "term",
            F.round(F.col("tfidf") * scale).cast("long").alias("wf"),
        )
        .where(F.col("wf") != 0)
        .localCheckpoint(eager=False)  # three consumers: norms + both join legs
    )
    norms = wf.groupBy(id_col).agg(F.sum(F.col("wf") * F.col("wf")).alias("n2"))
    a = wf.select(F.col(id_col).alias("id_a"), "term", F.col("wf").alias("wa"))
    b = wf.select(F.col(id_col).alias("id_b"), "term", F.col("wf").alias("wb"))
    dots = (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("n2").alias("n2b"))
    cos = F.round(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("n2a").cast("double")) * F.sqrt(F.col("n2b").cast("double"))),
        6,
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= min_sim)
    )


def bm25(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
    checkpoint_tf: bool = False,
) -> DataFrame:
    """Okapi BM25 term weights — (doc_id, term, tf, score) with the
    document-length saturation TF-IDF lacks; the standard retrieval /
    data-curation relevance weight (Robertson & Zaragoza 2009).

    score = idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Plan shape (round 9): one explode pass builds the tf frame with dl —
    the per-document token count — carried IN the group key as row-local
    arithmetic on the token array (dl == sum of tf per doc since empty
    tokens are dropped on both routes; the same equivalence
    test_bm25_search_matches_full_postings_route pins for the search
    twin). That deletes the doc-keyed window over the corpus-sized tf
    frame — a full exchange + sort — that the previous form paid; df
    (term document frequency) stays a window over the tf frame (no
    second pass over raw text), and N / total token count enter as a
    1-row broadcast. Scores round to 6dp so libm ln ulp differences
    can't leak into cross-engine comparisons. avgdl counts tokens/docs
    over the whole corpus (empty docs lower avgdl but earn no term rows,
    same convention as tfidf_from_tf's note)."""
    from pyspark.sql.window import Window

    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    src = ensure_min_parallelism(
        docs.select(F.col(id_col), F.col(text_col)), id_col
    )
    dl_col = F.size(F.array_remove(F.split(F.col(text_col), " "), "")).cast(
        "long"
    )
    tf = (
        src.select(
            F.col(id_col),
            dl_col.alias("dl"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    if checkpoint_tf:
        # round 9 (guide §5): the bm25_from_tf story applied in-session —
        # the postings frame is the materialized artifact; warm
        # executions weight it instead of re-tokenizing the corpus
        # (it also feeds BOTH the stats aggregate and the scored path,
        # which otherwise re-run the explode per consumer). Value-neutral.
        tf = tf.localCheckpoint(eager=False)
    stats = (
        tf.agg(F.sum("tf").alias("total_tf"))
        .crossJoin(F.broadcast(docs.select(F.count("*").alias("n_docs"))))
    )
    df_w = Window.partitionBy("term")
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / (F.col("total_tf") / F.col("n_docs"))
    )
    scored = (
        tf.withColumn("df", F.count("*").over(df_w))
        .crossJoin(F.broadcast(stats))
        .withColumn("score", F.round(idf * F.col("tf") * (k1 + 1.0) / denom, 6))
        .select(id_col, "term", "tf", "score")
    )
    if top_k is None:
        return scored
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .drop("rn")
    )


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Multi-query top-k BM25 retrieval — the search-engine / RAG-recall
    shape built on the ``bm25()`` postings frame.

    ``queries`` is a tiny (query_id, qtext) frame; result is one row per
    (query_id, retrieved doc) with the summed BM25 score over the query's
    DISTINCT terms, ranked 1..k per query.

    Plan shape for the 100 TB design point (round 9: score ONLY the
    postings of query terms, in ONE corpus pass — the previous form ran
    ``bm25()`` over the whole corpus, deriving df with a per-term window
    and dl with a per-doc window over the FULL tf frame, i.e. two
    corpus-wide shuffle+sorts to score a handful of query terms; a first
    rewrite kept tf as a shared frame with separate dl/stats aggregate
    branches, but per-branch column pruning defeats ReuseExchange and the
    explode ran once per branch — measurably slower):
    - dl (per-doc token count) is ROW-LOCAL arithmetic on the token
      array, not an aggregate — it rides the tf group key (functionally
      dependent on the doc id), so the probe needs NO doc-keyed join;
    - the exploded token stream is filtered ON TERM by the broadcast
      query vocabulary BEFORE the (doc, term) aggregate — the classic
      inverted-index probe: the only corpus-sized exchange carries
      partial counts of query-term postings alone;
    - df for the surviving terms is a groupBy over the probed postings
      (identical to the full-corpus per-term count for those terms);
      total_tf is the sum of the row-local dl projection and n_docs a
      bare count — one cheap scan each, no second explode;
    - per-(query, doc) score totals are a partial-aggregated groupBy whose
      key cardinality is bounded by (queries x matched docs), tiny next to
      the corpus;
    - top-k per query is a row_number window the optimizer rewrites to
      WindowGroupLimit — per-partition heaps of k rows, not a full sort;
    - the score expression is textually identical to ``bm25()``'s and the
      score sum runs in fixed point (``dsum``), so every value is
      bit-identical to scoring the full postings frame and filtering
      (asserted by test_bm25_search_matches_full_postings_route).
    """
    from pyspark.sql.window import Window

    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    qterms = (
        queries.select(
            "query_id",
            F.explode(F.array_distinct(F.split(F.col("qtext"), " "))).alias("term"),
        )
        .where(F.col("term") != "")
        # (queries x terms)-sized by contract, but its lineage is a scan
        # of wherever the caller got the query texts (often the corpus
        # itself, filtered to a handful of ids) — cut it so the two
        # consumers (vocab build + the scored join's broadcast) don't
        # re-read that source per execution
        .localCheckpoint(eager=False)
    )
    vocab = qterms.select("term").distinct()
    src = ensure_min_parallelism(
        docs.select(F.col(id_col), F.col(text_col)), id_col
    )
    # dl = non-empty token count, row-local (== sum of tf per doc, since
    # term_frequencies drops empty tokens); long like the former sum
    dl_col = F.size(F.array_remove(F.split(F.col(text_col), " "), "")).cast(
        "long"
    )
    # one corpus scan for both corpus constants (sum dl + row count)
    stats = src.agg(
        F.sum(dl_col).alias("total_tf"), F.count("*").alias("n_docs")
    )
    tfq = (
        src.select(
            F.col(id_col),
            dl_col.alias("dl"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .join(F.broadcast(vocab), "term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
        # the 1-row corpus constants ride the postings frame INTO the
        # checkpoint below: stats needs its own corpus pass (it cannot be
        # derived from the term-filtered postings), and leaving it
        # outside the cut re-tokenized the whole corpus on every
        # re-execution of every consumer (q_rrf_fusion / q_rag_context_
        # pack re-run this subtree; measured ~0.6 s of each consumer's
        # warm time at sf0.1, round 9)
        .crossJoin(F.broadcast(stats))
        # Materialize ONCE: tfq feeds both the broadcast df build (a
        # driver-collect job) and the scored path — without the cut the
        # corpus explode+probe executes once per consumer (measured
        # 1.5 s -> 2.2 s regression on q_bm25_search when the first
        # probe-first cut shipped without it). The checkpointed frame is
        # query-term-postings-sized, not corpus-sized.
        .localCheckpoint(eager=False)
    )
    dfreq = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # same expressions, verbatim, as bm25() — bit-identical doubles
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / (F.col("total_tf") / F.col("n_docs"))
    )
    scored = (
        # total_tf / n_docs already ride every tfq row (staged above)
        tfq.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .withColumn("score", F.round(idf * F.col("tf") * (k1 + 1.0) / denom, 6))
    )
    totals = (
        scored.groupBy("query_id", id_col)
        .agg(
            F.round(dsum("score"), 6).alias("total_score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("total_score"), F.asc(id_col)
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def bm25_from_tf(
    tf: DataFrame,
    *,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 from an already-MATERIALIZED term-frequency frame — the 100 TB
    path, mirroring ``tfidf_from_tf``'s rationale: the one-shot ``bm25()``
    derives df and dl with windows over the TF frame, and the per-term
    window partitions are exactly the stopword-skewed shape that buffers
    billions of rows per hot key at corpus scale. With tf materialized,
    df/dl/totals become partially-aggregated groupBys (skew-free map-side
    combine) joined back on the aggregated keys — AQE broadcasts the
    vocabulary side when small.

    Identical output to ``bm25()`` on the same tf rows (asserted by test):
    N is countDistinct(doc) over tf — the tfidf_from_tf empty-doc
    convention note applies."""
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = tf.agg(
        F.sum("tf").alias("total_tf"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / (F.col("total_tf") / F.col("n_docs"))
    )
    return (
        tf.join(dfreq, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("score", F.round(idf * F.col("tf") * (k1 + 1.0) / denom, 6))
        .select(id_col, "term", "tf", "score")
    )
