"""Distributed generalized suffix array over tokenized documents —
prefix doubling (Manber–Myers) as O(log n) DataFrame sort rounds, plus
the adjacent-suffix LCP table that makes EXACT maximal duplicated spans
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" — the suffix-array form of substring dedup, which the CDC-chunk
family in operators/chunking.py approximates) a first-class relational
result.

Why this shape at 100 TB: a suffix array is a GLOBAL sort of all corpus
suffixes. Materializing suffix strings is O(n²) bytes; prefix doubling
never materializes more than two integer ranks per position — round k
orders positions by the pair (rank[i], rank[i + 2^k]), so after
ceil(log2(maxlen)) rounds the ranks order full suffixes. Round
ingredients are pure Spark primitives: the shifted rank is a
``lead(r, 2^k)`` window inside each document (partition-parallel, one
doc-keyed shuffle — no self-join), and the global re-rank is a
range-partitioned sort.

Global dense-rank assignment (the per-round primitive) deliberately
avoids the single-partition Window.orderBy() anti-pattern this repo's
plan gates forbid: the frame is repartitionByRange'd on the key (equal
keys can never straddle a range partition — the partitioner maps equal
keys identically), local dense ranks run inside mapInPandas with
running state across the partition's Arrow batches, and partition
offsets (one row per partition, collected bounded) are folded back in a
map-side expression. Output ranks are boundary-invariant, so the range
partitioner's sampled bounds don't affect results. Partition count
scales with the frame (``_RANK_ROWS_PER_PART`` rows per partition,
capped by the session's shuffle parallelism) so fixture-scale inputs
don't pay a 32-task floor per round while cluster-scale inputs fan out.

Reference scope note: /root/reference has no text analytics at all
(code/airflow/dags/* is tabular/JSON ingestion); this module is part of
the LLM-training-data extension surface the build brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_RANK_SCHEMA_SUFFIX = "__pid int, __lrank long"
_RANK_ROWS_PER_PART = 2_000_000


def _rank_partitions(spark, n_rows: int | None) -> int:
    conf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if n_rows is None:
        return conf
    return max(1, min(conf, (n_rows + _RANK_ROWS_PER_PART - 1) // _RANK_ROWS_PER_PART))


def _global_dense_rank_counted(
    df: DataFrame, key_cols: list[str], out_col: str,
    num_partitions: int | None = None, n_rows: int | None = None,
) -> "tuple[DataFrame, int]":
    """(ranked frame, number of distinct keys). The distinct count falls
    out of the same bounded per-partition stats collect that builds the
    rank offsets — no extra job."""
    spark = df.sparkSession
    n_parts = num_partitions or _rank_partitions(spark, n_rows)
    cols = df.columns
    if n_parts == 1:
        # Single-partition inputs (fixture scale): repartitionByRange
        # would still run the range partitioner's SAMPLING job before the
        # sort — one extra job per doubling round for bounds that don't
        # matter when everything lands in one partition anyway. coalesce
        # is shuffle- and sample-free; the local sort then IS the global
        # sort, so ranks are identical. Cluster-scale inputs (n_parts > 1)
        # keep the range path untouched.
        parts = df.coalesce(1).sortWithinPartitions(*key_cols)
    else:
        parts = df.repartitionByRange(n_parts, *key_cols).sortWithinPartitions(
            *key_cols
        )

    def local_rank(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        last_key = None
        rank = 0
        for pdf in batches:
            ranks = []
            for key in zip(*[pdf[c] for c in key_cols]):
                if key != last_key:
                    rank += 1
                    last_key = key
                ranks.append(rank)
            out = pdf.copy()
            out["__pid"] = pid
            out["__lrank"] = pd.Series(ranks, dtype="int64").values
            yield out[cols + ["__pid", "__lrank"]]

    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in parts.schema)
        + ", " + _RANK_SCHEMA_SUFFIX
    )
    # localCheckpoint: the stats scan and the output scan both consume the
    # ranked frame — without it the range sort + local rank would run twice.
    ranked = parts.mapInPandas(local_rank, schema=schema).localCheckpoint(
        eager=False
    )
    stats = (
        ranked.groupBy("__pid").agg(F.max("__lrank").alias("__cnt")).collect()
    )
    offsets = {}
    run = 0
    for row in sorted(stats, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = run
        run += row["__cnt"]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("__pid"),
    )
    out = ranked.select(
        *cols, (F.col("__lrank") + F.coalesce(off_expr, F.lit(0))).alias(out_col)
    )
    return out, run


def global_dense_rank(
    df: DataFrame, key_cols: list[str], out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a GLOBAL dense rank (1-based, ordered by ``key_cols``)
    without a single-partition window: range-partition on the key, rank
    locally with running state, offset by the per-partition distinct
    counts. Equal keys land in one partition by construction, so local
    dense ranks compose exactly. Deterministic regardless of the range
    partitioner's sampled bounds."""
    out, _n = _global_dense_rank_counted(
        df, key_cols, out_col, num_partitions=num_partitions
    )
    return out


def suffix_array_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_rounds: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Generalized (per-document, whitespace-token-level) suffix array:
    one row per (doc, pos) suffix with its 1-based global ``sa_rank`` —
    the rank brute-force lexicographic suffix sorting would assign, with
    ties between identical suffixes of different documents broken by
    (doc, pos). Computed by prefix doubling: rank_0 from single tokens,
    then round k re-ranks by (rank, lead(rank, 2^k) within the doc, 0
    when the suffix ends first — shorter sorts first); terminates when
    2^k covers the longest document (identical cross-doc suffixes keep
    equal ranks forever, so rank-distinctness alone is only the early
    exit, not the terminator). Suffixes never cross document boundaries
    — each document is its own string, the generalized-SA convention.

    Pass ``stats={}`` to receive observability fields back: ``rounds``
    (doubling rounds actually run — bounded by ceil(log2 maxlen), the
    quantity that stays ~constant as the corpus widens at fixed doc
    length), ``n_suffixes`` and ``max_len``."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    head = toks.agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("maxpos")
    ).head()
    if head["maxpos"] is None:
        # Empty input (no rows, or no tokens): the doubling loop has
        # nothing to rank. Return an empty frame with the output schema
        # (id type preserved from the input) rather than crashing on
        # int(None).
        id_type = df.schema[id_col].dataType.simpleString()
        if stats is not None:
            stats.update(rounds=0, n_suffixes=0, max_len=0)
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, pos int, sa_rank long"
        )
    n_total, max_len = int(head["n"]), int(head["maxpos"]) + 1
    n_parts = _rank_partitions(df.sparkSession, n_total)
    p, n_distinct = _global_dense_rank_counted(
        toks, ["tok"], "r", num_partitions=n_parts
    )
    p = p.select("doc", "pos", "r")
    wdoc = W.partitionBy("doc").orderBy("pos")
    # Radix-8 prefix doubling (the standard higher-radix generalization:
    # after a round, r covers RADIX x the previous length, because the
    # rank tuple (r(i), r(i+c), ..., r(i+7c)) lexicographically compares
    # truncated suffixes up to 8c exactly as the classic pair does up to
    # 2c — block m's rank encodes block m's content, 0-padding keeps the
    # shorter-suffix-sorts-first convention). Same exact output, but
    # ceil(log8 maxlen) global-rank rounds instead of ceil(log2 maxlen):
    # each round is ONE window pass (all leads share wdoc) + ONE rank
    # shuffle, and round count — not bytes — is the fixed-cost driver
    # both at fixture scale (Spark job dispatch) and at 100 TB (shuffle
    # barriers).
    radix = 8
    gap = 1  # tokens covered by the current rank r
    rounds = 0
    while gap < max_len and n_distinct < n_total:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"suffix_array_tokens exceeded max_rounds={max_rounds} "
                "doubling rounds — raise max_rounds for documents longer "
                f"than {radix}^{max_rounds} tokens"
            )
        keyed = p
        key_cols = ["r"]
        for j in range(1, radix):
            keyed = keyed.withColumn(
                f"r{j}", F.coalesce(F.lead("r", j * gap).over(wdoc), F.lit(0))
            )
            key_cols.append(f"r{j}")
        p, n_distinct = _global_dense_rank_counted(
            keyed, key_cols, "rr", num_partitions=n_parts
        )
        p = p.select("doc", "pos", F.col("rr").alias("r"))
        gap *= radix
    # final tie-break (identical cross-doc suffixes share r): (r, doc, pos)
    # is unique, so the dense rank IS the 1-based suffix-array position.
    out, _n = _global_dense_rank_counted(
        p, ["r", "doc", "pos"], "sa_rank", num_partitions=n_parts
    )
    if stats is not None:
        stats.update(rounds=rounds, n_suffixes=n_total, max_len=max_len)
    return out.select(F.col("doc").alias(id_col), "pos", "sa_rank")


def suffix_lcp_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_lcp: int = 2,
    max_rounds: int = 20,
    sa: DataFrame | None = None,
    max_span: int = 512,
    hint_small: bool = False,
) -> DataFrame:
    """EXACT duplicated token spans via the suffix array: adjacent
    suffixes in SA order share their longest common prefix with SOME
    other corpus suffix exactly there (the classic SA/LCP property), so
    every maximal duplicated span of length >= min_lcp appears as an
    adjacent pair. Output: one row per adjacent pair with lcp >=
    min_lcp — (doc_a, pos_a, doc_b, pos_b, lcp, span) where span is the
    shared token prefix. The LCP is a first-mismatch fold over the two
    zipped token arrays (JVM-side aggregate, no UDF). Pass a precomputed
    ``sa`` (e.g. the per-process memo) to skip the doubling rounds.

    ``max_span`` bounds the per-row materialized suffix slice: each
    adjacent pair compares at most ``max_span`` tokens, so the working
    set is O(n * max_span) tokens, never O(sum L^2) — without the cap a
    corpus of long documents would materialize every full suffix.
    Reported ``lcp`` is exact whenever the true LCP < max_span and
    clamps to max_span otherwise (a duplicated span that long is a
    dedup hit regardless of its exact length).

    ``hint_small=True`` adds broadcast hints on the SA side of the token
    join and on the swapped side of the adjacent-pair self-join — for
    callers whose corpus slice is bounded by construction (the memo-backed
    doc_id<cap keys): both frames are then slice-sized, and without the
    hint the planner sees statless RDD-scan subtrees and burns two
    sort-merge exchange+sort pairs on kilobytes. Default off: at corpus
    scale the SA is corpus-sized and the shuffle joins are the right
    plan."""
    if max_span < min_lcp:
        raise ValueError(
            f"max_span={max_span} must be >= min_lcp={min_lcp} — a cap "
            "below the reporting threshold would silently drop spans"
        )
    if sa is None:
        sa = suffix_array_tokens(df, id_col, text_col, max_rounds=max_rounds)
    toks = df.select(
        F.col(id_col).alias("__d"), F.split(F.col(text_col), " ").alias("__l")
    )
    if hint_small:
        sa = F.broadcast(sa)
    suf = (
        sa.join(toks, sa[id_col] == toks["__d"])
        .select(
            id_col,
            "pos",
            "sa_rank",
            F.slice(
                F.col("__l"),
                F.col("pos") + 1,
                F.least(
                    F.size("__l") - F.col("pos"), F.lit(max_span)
                ),
            ).alias("suf"),
        )
    )
    a = suf.select(
        F.col(id_col).alias("doc_a"), F.col("pos").alias("pos_a"),
        F.col("sa_rank"), F.col("suf").alias("suf_a"),
    )
    b = suf.select(
        F.col(id_col).alias("doc_b"), F.col("pos").alias("pos_b"),
        (F.col("sa_rank") - 1).alias("sa_rank"), F.col("suf").alias("suf_b"),
    )
    pairs = a.join(F.broadcast(b) if hint_small else b, "sa_rank")
    lcp = F.expr(
        "aggregate(zip_with(suf_a, suf_b, (x, y) -> CASE WHEN x = y THEN 1 "
        "ELSE 0 END), named_struct('run', CAST(0 AS BIGINT), 'stop', false), "
        "(acc, v) -> CASE WHEN acc.stop OR v = 0 THEN "
        "named_struct('run', acc.run, 'stop', true) ELSE "
        "named_struct('run', acc.run + 1, 'stop', false) END).run"
    )
    return (
        pairs.withColumn("lcp", lcp)
        .where(F.col("lcp") >= min_lcp)
        .select(
            "doc_a", "pos_a", "doc_b", "pos_b", "lcp",
            F.concat_ws(" ", F.slice("suf_a", 1, F.col("lcp").cast("int"))).alias("span"),
        )
    )
