"""Round-9 optimization equivalence + plan gates.

Each round-9 rewrite must produce BIT-IDENTICAL rows to the shape it
replaced (the driver re-hashes every key), so every test here pins the
new plan against an inline reconstruction of the pre-optimization logic
over the real fixture corpus — not a toy frame — plus a plan gate where
the optimization's whole point is a removed exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.compact import (
    ensure_min_parallelism,
)
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES
from fortune_500_financial_insights_pipeline_spark.queries._core import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


# ---------------------------------------------------------------------------
# q_simhash_pairs: first-matching-band emission == dropDuplicates emission
# ---------------------------------------------------------------------------


def test_simhash_pairs_first_band_matches_dedup(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        bucket_pairs,
        simhash_portable,
    )

    docs = ensure_min_parallelism(_docs(spark, sf_dir), "doc_id")
    sigs = docs.select("doc_id", simhash_portable("text").alias("sig"))
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.floor(F.col("sig") / F.lit(float(2 ** (12 * b)))).cast(
                                "long"
                            )
                            % 4096
                        ).alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.band", "bb.bval")
    # pre-round-9 route: emit per bucket, dropDuplicates
    old = bucket_pairs(bands, ["band", "bval"], "doc_id", carry_cols=("sig",)).select(
        "id_a", "id_b"
    )
    new = QUERIES["q_simhash_pairs"](spark, sf_dir).select("id_a", "id_b")
    a = sorted(map(tuple, new.collect()))
    b = sorted(map(tuple, old.collect()))
    assert a == b
    assert len(set(a)) == len(a), "first-band emission produced duplicates"


def test_simhash_pairs_plan_has_no_dedup_exchange(spark, sf_dir):
    """The whole point of the first-band filter: no dropDuplicates over
    the candidate-pair stream — exactly TWO shuffle exchanges survive
    (the parallelism guard and the keyed repartition the bucket groupBy
    reuses), and no aggregate runs above the pair explode."""
    import re

    df = QUERIES["q_simhash_pairs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 2, plan
    # the dedup was a plain HashAggregate keyed on (id_a, id_b) — gone;
    # the only aggregates left are the bucket collect_list pair
    # (ObjectHashAggregate partial/final)
    assert not re.findall(r"(?<!Object)HashAggregate", plan), plan
    assert plan.count("ObjectHashAggregate") == 2, plan


# ---------------------------------------------------------------------------
# char_entropy: row-local sorted-runs fold == explode + two hash aggregates
# ---------------------------------------------------------------------------


def test_char_entropy_rowlocal_matches_aggregate(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import (
        dsum,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        char_entropy,
    )

    d = _docs(spark, sf_dir)

    # pre-round-9 aggregate form, verbatim
    docs = d.select(
        "doc_id", F.lower(F.substring("text", 1, 240)).alias("__t")
    ).where(F.length("__t") > 0)
    chars = docs.select(
        "doc_id",
        F.length("__t").cast("long").alias("__n"),
        F.explode(F.sequence(F.lit(1), F.length("__t"))).alias("__i"),
        "__t",
    ).select("doc_id", "__n", F.expr("substring(__t, __i, 1)").alias("__c"))
    counts = chars.groupBy("doc_id", "__n", "__c").agg(
        F.count(F.lit(1)).alias("__n_c")
    )
    p = F.col("__n_c") / F.col("__n")
    old = counts.groupBy("doc_id").agg(
        (-dsum(p * F.log2(p))).alias("entropy_bits"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
    )

    new = char_entropy(d)
    assert new.dtypes == old.dtypes
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))


def test_char_entropy_plan_is_map_only(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        char_entropy,
    )

    plan = (
        char_entropy(_docs(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "HashAggregate" not in plan


# ---------------------------------------------------------------------------
# repetition_stats: row-local sorted-runs fold == two stacked aggregates
# ---------------------------------------------------------------------------


def test_repetition_stats_rowlocal_matches_aggregate(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        repetition_stats,
        word_ngrams_all,
    )

    d = _docs(spark, sf_dir)
    src = ensure_min_parallelism(d.select("doc_id", "text"), "doc_id")
    grams = src.select(
        "doc_id", F.explode(word_ngrams_all("text", 2)).alias("gram")
    )
    per = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    old = per.groupBy("doc_id").agg(
        (F.max("cnt").cast("double") / F.sum("cnt").cast("double")).alias(
            "top_gram_frac"
        ),
        F.sum("cnt").cast("long").alias("n_grams"),
    )
    new = repetition_stats(d, "doc_id", "text")
    assert new.dtypes == old.dtypes
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))
    # the sort+fold tree must be built exactly once per row (an earlier
    # draft re-embedded it 3x through the filter + two field projections);
    # AQE's toString prints the initial plan after the final one, so count
    # within the final section only
    plan = new._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("array_sort") == 1, final


def test_repetition_stats_edge_docs_match_explode_form(spark):
    """Null-text docs surface through word_ngrams_all as a gram array of
    empty strings (not as a missing row), so the generator form must
    reproduce the explode form's rows for them too — compare against the
    old shape inline rather than assuming."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        repetition_stats,
        word_ngrams_all,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, None), (3, "x y")], "doc_id long, text string"
    )
    grams = df.select("doc_id", F.explode(word_ngrams_all("text", 2)).alias("gram"))
    per = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    old = per.groupBy("doc_id").agg(
        (F.max("cnt").cast("double") / F.sum("cnt").cast("double")).alias(
            "top_gram_frac"
        ),
        F.sum("cnt").cast("long").alias("n_grams"),
    )
    new = repetition_stats(df, "doc_id", "text")
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))


# ---------------------------------------------------------------------------
# gopher_repetition: fully row-local == tall-frame aggregate/join form
# ---------------------------------------------------------------------------


def test_gopher_repetition_rowlocal_matches_aggregate(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        GOPHER_DUP_NGRAM_MAX,
        GOPHER_TOP_NGRAM_MAX,
        gopher_repetition,
    )

    d = _docs(spark, sf_dir)
    top_ns = sorted(GOPHER_TOP_NGRAM_MAX)
    dup_ns = sorted(GOPHER_DUP_NGRAM_MAX)

    # pre-round-9 tall-frame form, verbatim
    src = (
        ensure_min_parallelism(d.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            F.col("text").alias("__txt"),
            F.split("text", " ").alias("__tk"),
        )
        .where(F.col("__tk").isNotNull())
    )
    tk, sz = F.col("__tk"), F.size(F.col("__tk"))
    total = src.select(
        "doc_id", (F.length("__txt") - sz + 1).cast("long").alias("__total_chars")
    )

    def gram_arr(n):
        return F.when(
            sz >= n,
            F.transform(
                F.sequence(F.lit(0), sz - n),
                lambda p: F.struct(
                    F.lit(n).alias("n"),
                    F.array_join(F.slice(tk, p + 1, n), " ").alias("gram"),
                    p.alias("pos"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,gram:string,pos:int>>"))

    def tall(ns):
        return src.select(
            "doc_id", F.explode(F.concat(*[gram_arr(n) for n in ns])).alias("__g")
        ).select(
            "doc_id",
            F.col("__g.pos").alias("__pos"),
            F.col("__g.n").alias("__n"),
            F.col("__g.gram").alias("__gram"),
        )

    tmass = (
        tall(top_ns)
        .groupBy("__n", "doc_id", "__gram")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .groupBy("__n", "doc_id")
        .agg(
            F.max(F.col("__cnt") * (F.length("__gram") - (F.col("__n") - 1)))
            .cast("long")
            .alias("__mass")
        )
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("__n") == n, F.col("__mass")))
                .cast("long")
                .alias(f"__top{n}_mass")
                for n in top_ns
            ]
        )
    )
    dgrams = tall(dup_ns)
    dups = (
        dgrams.groupBy("__n", "doc_id", "__gram")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") >= 2)
        .select("__n", "doc_id", "__gram")
    )
    lens = src.select(
        "doc_id",
        F.posexplode(F.transform(tk, lambda t: F.length(t))).alias(
            "__pos", "__len"
        ),
    )
    dcov = (
        dgrams.join(dups, ["__n", "doc_id", "__gram"], "left_semi")
        .select(
            "__n",
            "doc_id",
            F.explode(
                F.sequence(F.col("__pos"), F.col("__pos") + F.col("__n") - 1)
            ).alias("__pos"),
        )
        .distinct()
        .join(lens, ["doc_id", "__pos"])
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("__n") == n, F.col("__len")).otherwise(0))
                .cast("long")
                .alias(f"__dup{n}_chars")
                for n in dup_ns
            ]
        )
    )
    out = total.join(tmass, "doc_id", "left").join(dcov, "doc_id", "left")
    cols = [F.col("doc_id")]
    passes = []
    for n, thr in sorted(GOPHER_TOP_NGRAM_MAX.items()):
        frac = F.round(
            F.coalesce(F.col(f"__top{n}_mass"), F.lit(0)).cast("double")
            / F.col("__total_chars"),
            6,
        )
        flag = frac <= thr
        cols += [frac.alias(f"top{n}_frac"), flag.alias(f"r_top{n}")]
        passes.append(flag)
    for n, thr in sorted(GOPHER_DUP_NGRAM_MAX.items()):
        frac = F.round(
            F.coalesce(F.col(f"__dup{n}_chars"), F.lit(0)).cast("double")
            / F.col("__total_chars"),
            6,
        )
        flag = frac <= thr
        cols += [frac.alias(f"dup{n}_frac"), flag.alias(f"r_dup{n}")]
        passes.append(flag)
    acc = passes[0]
    for p in passes[1:]:
        acc = acc & p
    old = out.select(*cols, acc.alias("pass_all"))

    new = gopher_repetition(d)
    assert new.dtypes == old.dtypes
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))


def test_gopher_repetition_operator_is_map_only(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        gopher_repetition,
    )

    plan = (
        gopher_repetition(_docs(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only exchange is the parallelism guard under the gram folds
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "HashAggregate" not in plan
    assert "Join" not in plan
    assert "Window" not in plan
