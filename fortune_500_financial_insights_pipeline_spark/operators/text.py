"""Text-analysis operators over a documents table (SURVEY.md §2.11):
tokenization, language-ID heuristic, quality scoring, token counting,
content fingerprinting, and n-gram similarity.

Everything is built from JVM-side array/string functions (split, filter,
transform, aggregate) — no Python in the hot path — so the plans stay inside
whole-stage codegen and scale by partition count alone (no shuffles except
where a groupBy is the semantic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# minimal English function-word list for the n-gram/stopword heuristic
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-alnum marks
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column | str) -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_stop.cast("double") / F.size(toks).cast("double")


def english_score(text: Column | str) -> Column:
    """Language-ID heuristic: share of tokens that are English function
    words. A real n-gram model is a longer stopword/ngram table — the plan
    shape (array filter over a literal array) is identical."""
    return stopword_ratio(text)


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: length band + average word
    length band + stopword presence. Deterministic double arithmetic."""
    c = text if isinstance(text, Column) else F.col(text)
    n_chars = F.length(c).cast("double")
    n_toks = token_count(c).cast("double")
    avg_word = n_chars / n_toks
    len_term = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    word_term = F.when((avg_word >= 3.0) & (avg_word <= 10.0), 1.0).otherwise(0.5)
    stop_term = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    return (len_term * 0.4 + word_term * 0.3 + stop_term * 0.3).cast("double")


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 of case/whitespace-normalized text.
    Uniformly distributed — safe as a shuffle/dedup key."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def _bind(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE and hand it to ``fn`` as a lambda variable.

    Column helpers can't materialize a projection, so any helper that
    references its input expression inside an array lambda re-embeds that
    expression per element access — for ``word_ngrams`` that re-ran the
    tokenizer split() for every element_at of every gram (measured 2.3 s →
    0.37 s at sf0.1, round 9). Wrapping the value in a 1-element array and
    transform()-ing binds it to a NamedLambdaVariable: inner lambdas then
    reference the bound value, which Spark evaluates once per row."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def word_ngrams(text: Column | str, n: int = 2) -> Column:
    """Distinct word n-grams as an array (0-indexed array lambda —
    JVM-side, no UDF; the token array is lambda-bound so the tokenizer
    runs once per row, not once per gram element)."""

    def grams(tk: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(tk) - n)
        return F.array_distinct(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(tk, (i + j + 1).cast("int")) for j in range(n)],
                ),
            )
        )

    return _bind(tokens(text), grams)


def duplicated_spans(df, n: int = 8, id_col: str = "doc_id", text_col: str = "text"):
    """Cross-document duplicated text spans: every n-word window whose
    exact content occurs in ≥2 distinct documents, reported per (doc,
    start position) — exact substring dedup at span granularity
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better": doc-level dedup misses boilerplate INSIDE otherwise-unique
    documents; span-level catches it).

    Scale shape: one positioned-window explode (≈ token count rows — the
    only volume-carrying stage, behind the parallelism guard), then all
    work happens on the 32-byte md5 span key: a count-distinct-docs
    aggregate finds shared spans and an equi-join re-attaches positions.
    The span text itself never rides a shuffle."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    # Materialize the token array in its own projection before the window
    # transform: referencing the raw tokens() expression inside the lambda
    # would re-embed the tokenizer once per element access, blowing the
    # expression tree up to O(n) copies and stalling optimize/codegen for
    # seconds before the first row moves.
    src = ensure_min_parallelism(
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__tk")), id_col
    )
    tk = F.col("__tk")
    windows = F.transform(
        F.sequence(F.lit(0), F.size(tk) - n),
        lambda i: F.md5(F.array_join(F.slice(tk, i + 1, n), " ")),
    )
    spans = src.where(F.size(tk) >= n).select(
        id_col, F.posexplode(windows).alias("pos", "span_hash")
    )
    shared = (
        spans.groupBy("span_hash")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("span_hash")
    )
    return spans.join(shared, "span_hash").select(id_col, "pos", "span_hash")


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two string arrays (distinct-set semantics)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / union


def rolling_fingerprint(text: Column | str, base: int = 31, mod: int = 288230376151711717) -> Column:
    """Polynomial rolling hash over whitespace tokens (Rabin–Karp style):
    h = Σ h·base + tokhash  (mod 2^61-1), entirely JVM-side via a
    higher-order fold — an order-SENSITIVE fingerprint, unlike md5 of the
    normalized text (`fingerprint`): token transpositions change it, so
    it also serves as a cheap shingle hash for windowed dedup.

    Token values come from xxhash64 (stable across Spark versions and
    partitionings); the fold keeps everything in long arithmetic inside
    codegen — no strings survive past the first projection. The default
    modulus is the largest prime below 2^58: acc*base + term then peaks
    below 2^63, so the fold never wraps int64 (a Mersenne-2^61 modulus
    would overflow at acc*31 and silently diverge from any big-int
    reference — caught by the Hypothesis model test)."""
    c = text if isinstance(text, Column) else F.col(text)
    toks = F.split(c, " ")
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(base) + F.pmod(F.xxhash64(t), F.lit(mod)), F.lit(mod)
        ),
    )


def word_ngrams_all(text: Column | str, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (the stream, not the set) — the
    input for repetition statistics, where how often a gram repeats is
    the whole point. Same lambda-bound JVM array form as
    ``word_ngrams``."""

    def grams(tk: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(tk) - n)
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(tk, (i + j + 1).cast("int")) for j in range(n)],
            ),
        )

    return _bind(tokens(text), grams)


# PII patterns in the regex subset Java (Spark) and RE2 (DuckDB, Go tooling)
# interpret identically: character classes, \d, \b, bounded repetition.
# Order matters: emails first (an IPv4-looking domain must redact as part of
# the email), SSN before phone (3-2-4 vs 3-3-4 groupings don't overlap, but
# keeping the more specific pattern first is the safe default).
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("IPV4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its ``<KIND>`` tag — a chained
    regexp_replace, one codegen'd projection, no Python. The curation
    stage every shareable training corpus needs before packing."""
    c = text if isinstance(text, Column) else F.col(text)
    for kind, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, f"<{kind}>")
    return c


def pii_count(text: Column | str) -> Column:
    """Total PII matches across all patterns (counted on the raw text,
    before any replacement — chained counts would undercount a kind whose
    match a prior replacement consumed)."""
    c = text if isinstance(text, Column) else F.col(text)
    total = F.lit(0)
    for _, pat in PII_PATTERNS:
        total = total + F.regexp_count(c, F.lit(pat))
    return total


def repetition_stats(df, id_col: str, text_col: str, n: int = 2):
    """Gopher-style within-document repetition: the fraction of a
    document's n-gram STREAM occupied by its single most frequent n-gram
    (high fraction = boilerplate/loop junk; quality-filter rule 'top
    2-gram fraction' from Rae et al., Gopher appendix A).

    Shape (round 9, guide §2.4): the statistic is a function of one
    document's own gram stream, so it is computed ROW-LOCALLY — sort the
    gram array, run-length it with higher-order functions, take the max
    run. The former explode + two stacked hash aggregations (a corpus-
    gram-sized exchange) are gone: zero shuffles beyond the parallelism
    guard. max(cnt)/sum(cnt) over the aggregate rows equals
    max(run)/size(grams) over the sorted array exactly (same longs, same
    double casts); docs with an empty/null gram array emit no row, the
    explode's semantics."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    src = ensure_min_parallelism(df.select(F.col(id_col), F.col(text_col)), id_col)

    def _stats(sg: Column) -> Column:
        sz = F.size(sg)
        starts_expr = F.filter(
            F.sequence(F.lit(1), sz),
            lambda i: (i == F.lit(1)) | (F.get(sg, i - 1) != F.get(sg, i - 2)),
        )

        def from_starts(st: Column) -> Column:
            ends = F.concat(
                F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
                F.array(sz + 1),
            )
            counts = F.zip_with(ends, st, lambda e, s: (e - s).cast("long"))
            return F.struct(
                (F.array_max(counts).cast("double") / sz.cast("double")).alias(
                    "top_gram_frac"
                ),
                sz.cast("long").alias("n_grams"),
            )

        # sequence(1, 0) would count DOWN — guard empty arrays out (they
        # produce no row below anyway, matching the explode form)
        return F.when(sz > 0, F.array(_bind(starts_expr, from_starts)))

    # explode(when(.., array(struct))) materializes the stats struct ONCE
    # per row through the Generate (a null/empty doc emits no row — the
    # old explode's semantics) and leaves cheap field refs downstream;
    # a bare struct column here was re-embedded per consumer (filter +
    # two field projections = 3 copies of the sort+fold tree, measured)
    return src.select(
        F.col(id_col),
        F.explode(_bind(F.array_sort(word_ngrams_all(text_col, n)), _stats)).alias(
            "__s"
        ),
    ).select(
        F.col(id_col),
        F.col("__s.top_gram_frac").alias("top_gram_frac"),
        F.col("__s.n_grams").alias("n_grams"),
    )


def char_entropy(df, id_col: str = "doc_id", text_col: str = "text",
                 prefix_len: int = 240):
    """Per-document character entropy in bits over a bounded text prefix —
    the info-theoretic boilerplate/junk signal (low = repetitive, high =
    random bytes).

    Plan shape (round 9, guide §2.4): the histogram is a function of one
    row's own prefix, so the whole computation is ROW-LOCAL — sort the
    prefix's characters, run-length the sorted array with higher-order
    functions, and fold the p·log2(p) terms per row. The former shape
    (explode one row per character + two corpus-wide hash aggregations —
    1.2M rows at sf0.1 for 5k docs) is gone: zero exchanges, a pure map
    (measured 1.20 s → map-side cost at sf0.1). Values are bit-identical
    to the aggregate form: the per-run p·log2(p) doubles are the same
    IEEE terms, and the sum uses the same fixed-point interior as dsum
    (scale 1e6, exact long sum), which is order-independent — so the fold
    order cannot differ from the shuffle order (q_char_entropy pins it
    against the oracle; test_char_entropy_rowlocal_matches_aggregate pins
    it against the old plan)."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import (
        SCALE,
        _fixed,
    )

    docs = df.select(
        id_col, F.lower(F.substring(text_col, 1, prefix_len)).alias("__t")
    ).where(F.length("__t") > 0)
    # The empty-text guard matters: the oracle's range(1, 1) emits no row
    # for an empty prefix, so such docs must not surface here either.

    def _ent(t: Column) -> Column:
        n = F.length(t).cast("long")
        # split("") yields exactly the per-character array for any
        # non-empty string (incl. multibyte) — one native call instead of
        # prefix_len interpreted substr lambdas; empty texts are filtered
        # out above, where the two constructions would differ
        chars = F.split(t, "")

        def from_sorted(sc_: Column) -> Column:
            # run starts in the sorted char array (1-based positions);
            # F.get is 0-based and null-safe, so position 1 compares
            # against null and keeps only the `i == 1` disjunct
            starts_expr = F.filter(
                F.sequence(F.lit(1), F.size(sc_)),
                lambda i: (i == F.lit(1)) | (F.get(sc_, i - 1) != F.get(sc_, i - 2)),
            )

            def from_starts(st: Column) -> Column:
                ends = F.concat(
                    F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
                    F.array(F.size(sc_) + 1),
                )
                counts = F.zip_with(ends, st, lambda e, s: (e - s).cast("long"))
                p_of = lambda c: c / n  # noqa: E731 — long/long → double, as before
                s_fixed = F.aggregate(
                    counts,
                    F.lit(0).cast("long"),
                    lambda a, c: a + _fixed(p_of(c) * F.log2(p_of(c))),
                )
                ent = -((s_fixed.cast("double") / SCALE).cast("double"))
                return F.struct(
                    ent.alias("e"), F.size(st).cast("long").alias("k")
                )

            return _bind(starts_expr, from_starts)

        return _bind(F.array_sort(chars), from_sorted)

    return docs.select(
        id_col, _bind(F.col("__t"), _ent).alias("__s")
    ).select(
        id_col,
        F.col("__s.e").alias("entropy_bits"),
        F.col("__s.k").alias("n_distinct_chars"),
    )


# ---------------------------------------------------------------------------
# Hashed-feature linear classifier inference as relational algebra: the
# fastText-shaped quality/topic scorer big curation pipelines run over every
# document, expressed so the whole forward pass is engine-portable SQL.
# ---------------------------------------------------------------------------

CLASSIFIER_BUCKETS = 256  # two md5 hex digits, exactly uniform


def _feature_bucket_sql(value_sql: str) -> str:
    """Token -> feature bucket in [0, 256) as engine-shared SQL (the
    operators/cms.py md5-digit idiom with a fixed 'f' seed): every function
    (md5, substring, instr) evaluates identically in Spark and DuckDB."""
    alpha = "0123456789abcdef"
    h = f"md5(concat('f|', CAST({value_sql} AS STRING)))"
    d = lambda pos: f"(instr('{alpha}', substring({h}, {pos}, 1)) - 1)"  # noqa: E731
    return f"({d(1)} * 16 + {d(2)})"


def classifier_score(
    docs: DataFrame,
    weights_fp: DataFrame,
    *,
    scale: int = 1000,
    bias_fp: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Linear bag-of-hashed-tokens classifier forward pass (the fastText
    architecture without the embedding hidden layer): each token hashes to
    one of 256 buckets, the doc logit is bias + mean bucket weight, and the
    output is ``prob = round(sigmoid(logit), 6)``.

    ``weights_fp`` is a (bucket int, w_fp long) table of FIXED-POINT weights
    in units of 1/scale — per-doc accumulation is an exact long sum, so the
    result is independent of row order and partitioning (a double-weight sum
    would drift in the low bits across engines and poison round-6 compares);
    floats appear only in the final logit division and sigmoid. Docs with
    zero tokens emit no row (no features, no prediction), same convention as
    the tf frame.

    100 TB shape: one explode pass; the weight table is 256 rows broadcast;
    the per-doc aggregate partial-combines map-side so the shuffle carries
    one row per document, not per token. Inference cost is a hash + a
    broadcast-hash-join probe per token — no Python, no model server."""
    toks = (
        docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("__t"))
        .where(F.col("__t") != "")
    )
    feat = toks.select(
        id_col, F.expr(_feature_bucket_sql("__t")).cast("int").alias("bucket")
    )
    agg = (
        feat.join(F.broadcast(weights_fp), "bucket")
        .groupBy(id_col)
        .agg(F.sum("w_fp").alias("__sw"), F.count(F.lit(1)).alias("__nt"))
    )
    logit = F.lit(float(bias_fp) / scale) + F.col("__sw") / (
        float(scale) * F.col("__nt")
    )
    return agg.select(
        id_col, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("prob")
    )


def dup_fraction(df, n: int = 8, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document duplicate-text fraction: share of a doc's n-word
    windows whose exact content also appears in another document — the
    scalar quality signal the C4/RefinedWeb-style filters threshold on
    ("drop docs that are mostly boilerplate"), rolled up from the same
    span frame duplicated_spans reports row-wise.

    Same scale shape as duplicated_spans: one positioned-window explode,
    then all joins/aggregates ride the md5 span key; the rollup adds two
    doc-keyed aggregations (bounded by doc count). Docs shorter than n
    tokens have zero windows and fraction 0."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    # Token array materialized once (see duplicated_spans): embedding the
    # tokenizer expression in the lambda blows the tree to O(n) copies.
    src = ensure_min_parallelism(
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__tk")), id_col
    )
    tk = F.col("__tk")
    windows = F.transform(
        F.sequence(F.lit(0), F.size(tk) - n),
        lambda i: F.md5(F.array_join(F.slice(tk, i + 1, n), " ")),
    )
    spans = src.where(F.size(tk) >= n).select(
        id_col, F.explode(windows).alias("span_hash")
    )
    dups = (
        spans.groupBy("span_hash")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("span_hash")
    )
    totals = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    dup_counts = (
        spans.join(dups, "span_hash")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    nw = F.coalesce(F.col("n_windows"), F.lit(0))
    nd = F.coalesce(F.col("n_dup"), F.lit(0))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(dup_counts, id_col, "left")
        .select(
            id_col,
            nw.alias("n_windows"),
            nd.alias("n_dup"),
            F.when(nw == 0, F.lit(0.0))
            .otherwise(F.round(nd / nw, 6))
            .alias("dup_fraction"),
        )
    )


def bigram_logprob(df, lam: float = 0.7, id_col: str = "doc_id", text_col: str = "text"):
    """Interpolated bigram-LM quality score: per-doc average
    log2( λ·p(w2|w1) + (1-λ)·p(w2) ) under the corpus's OWN counts — the
    next step up from the unigram CCNet signal (`q_unigram_logprob`):
    word-order breakage (shuffled/boilerplate/spun text) now scores low
    even when the unigram mix looks normal. MLE conditionals with unigram
    interpolation (Jelinek–Mercer with a fixed λ; Chen & Goodman 1998's
    baseline) — no singleton discounting so every probability is an exact
    ratio of corpus counts and the score stays oracle-exact.

    One bigram explode feeds the per-doc counts AND (re-aggregated) the
    corpus tables — c(w1,w2), the w1 context totals, and the unigram
    distribution all join back on their own keys; per-row IEEE log terms,
    fixed-point per-doc sum, so the result is partitioning-invariant."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum

    toks = F.split(F.lower(F.col(text_col)), " ")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, (i + 1).cast("int")),
            F.element_at(toks, (i + 2).cast("int")),
        ),
    )
    doc_bg = (
        df.where(F.size(toks) >= 2)
        .select(F.col(id_col), F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("n_db"))
        .withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .withColumn("w2", F.split(F.col("bg"), " ").getItem(1))
    )
    c_bg = doc_bg.groupBy("bg").agg(F.sum("n_db").alias("c_bg"))
    c_w1 = doc_bg.groupBy("w1").agg(F.sum("n_db").alias("c_w1"))

    uni = (
        df.select(F.explode(toks).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    total = uni.agg(F.sum("n_t").alias("n_total"))

    p = F.lit(lam) * (F.col("c_bg") / F.col("c_w1")) + F.lit(1.0 - lam) * (
        F.col("n_t") / F.col("n_total")
    )
    scored = (
        doc_bg.join(c_bg, "bg")
        .join(c_w1, "w1")
        .join(uni, F.col("w2") == F.col("tok"))
        .crossJoin(F.broadcast(total))
    )
    term = F.col("n_db") * F.log2(p)
    return scored.groupBy(id_col).agg(
        (dsum(term) / F.sum("n_db")).alias("avg_log2_bigram"),
        F.sum("n_db").cast("long").alias("n_bigrams"),
    )


def line_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep_regex: str = "\\. ",
) -> DataFrame:
    """Within-document repeated-line fraction — the Gopher/C4 boilerplate
    rule the cross-document span detector (duplicated_spans) does not
    cover: a doc that repeats ITS OWN lines (nav chrome, templated rows)
    is low quality even if no other doc shares them.  Fixture documents
    are single-paragraph, so 'lines' are the sentence-ish units split on
    ``sep_regex`` — the rule is separator-parametric (use "\\n" for real
    line-structured corpora).

    Pure map-side array algebra (split / array_distinct / size) — zero
    shuffle, stays in codegen; the fraction is one deterministic double
    division of exact ints."""
    lines = F.split(F.col(text_col), sep_regex)
    n = F.size(lines)
    nd = F.size(F.array_distinct(lines))
    return df.select(
        F.col(id_col),
        n.alias("n_lines"),
        nd.alias("n_uniq"),
        ((n - nd).cast("double") / n).alias("dup_line_frac"),
    )


def code_detect(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    code_line_frac: float = 0.3,
):
    """Heuristic code-vs-prose triage per document: the fraction of lines
    carrying code signals (braces, semicolons, assignment, leading
    indent) plus overall symbol density — the cheap first-pass router a
    corpus pipeline uses to send documents to a code-specific cleaning
    branch before any expensive classifier runs.

    All signals are built-in HOF/regex expressions (no UDF): one
    ``filter`` over the split line array and two length counts — exact
    integer arithmetic, so the fractions are bit-identical cross-engine.
    Row-local, embarrassingly parallel, no shuffle.
    """
    lines = F.split(F.col(text_col), "\n")
    is_code_line = lambda x: (
        x.contains("{")
        | x.contains("}")
        | x.contains(";")
        | x.contains("=")
        | x.startswith("    ")
        | x.startswith("\t")
    )
    n_lines = F.size(lines)
    n_code = F.size(F.filter(lines, is_code_line))
    n_sym = F.length(text_col) - F.length(
        F.regexp_replace(text_col, "[^A-Za-z0-9 ]", "")
    )
    frac = F.round(n_code.cast("double") / n_lines, 6)
    sym_ratio = F.round(
        F.when(F.length(text_col) > 0, n_sym.cast("double") / F.length(text_col)).otherwise(
            0.0
        ),
        6,
    )
    return docs.select(
        id_col,
        n_lines.cast("long").alias("n_lines"),
        n_code.cast("long").alias("n_code_lines"),
        frac.alias("code_line_frac"),
        sym_ratio.alias("symbol_ratio"),
        (frac >= code_line_frac).alias("is_code"),
    )


def ngram_novelty(
    df: "DataFrame", n: int = 8, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-document novel n-gram rate under corpus (id) order: a gram is
    *novel* to the lowest-id document containing it, so the per-doc share
    of novel grams traces how fast the corpus stops contributing new
    content — the marginal-value curve dataset builders read before
    deciding whether another crawl snapshot is worth ingesting
    (complement of q_containment, which scores overlap against an
    EXTERNAL benchmark; this is self-novelty in ingestion order).

    Scale shape: the positioned-window explode is the only
    volume-carrying stage; everything after rides the 32-byte md5 gram
    key — a min-aggregate (first containing doc) and one equi-join back.
    Docs shorter than n tokens carry no grams and are excluded, exactly
    as the oracle excludes them.
    """
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    src = ensure_min_parallelism(
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__tk")), id_col
    )
    tk = F.col("__tk")
    gram = F.transform(
        F.sequence(F.lit(0), F.size(tk) - n),
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at(tk, (i + j + 1).cast("int")) for j in range(n)]
            )
        ),
    )
    grams = src.where(F.size(tk) >= n).select(
        F.col(id_col), F.explode(F.array_distinct(gram)).alias("__g")
    )
    first = grams.groupBy("__g").agg(F.min(id_col).alias("__first"))
    return (
        grams.join(first, "__g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("__first") == F.col(id_col), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            id_col,
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty_rate"),
        )
        .orderBy(id_col)
    )


# Gopher rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1) — the
# published heuristic filter suite for web-scale corpus curation. The
# stopword set below is the paper's 8-word existence list, distinct from
# EN_STOPWORDS (the 10-word ratio list used by the language-ID heuristic).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 15,
    max_words: int = 100_000,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-document Gopher quality-rule flags, INTEGER-EXACT by
    construction: every threshold of the published rule suite is a
    rational bound, so each comparison is cross-multiplied into pure
    integer arithmetic (3 <= mean word length <= 10 becomes
    3·n_words <= sum_word_len <= 10·n_words) — no float ever enters a
    pass/fail decision, which is what makes the flags bit-identical
    across engines and therefore oracle-hashable.

    Rules (r_* columns, True = pass):
      r_word_count   word count in [min_words, max_words]
      r_mean_word_len  mean word length in [3, 10] chars
      r_symbol_ratio   (# count + '...' count) <= 0.1 * words
      r_bullet         lines starting with a bullet <= 90%
      r_ellipsis       lines ending with '...' <= 30%
      r_alpha_words    >= 80% of words contain an alphabetic char
      r_stopwords      >= 2 distinct words from the existence list
                       (default: the paper's 8-word GOPHER_STOPWORDS)
      pass_all         AND of the seven

    Plan shape: one projection over the text column — split / filter /
    aggregate HOFs, all codegen'd JVM expressions, zero shuffle, no UDF.
    Embarrassingly parallel at any scale; the downstream aggregate (the
    caller's groupBy) is the only exchange."""
    flags = gopher_flag_columns(
        F.col(text_col), min_words=min_words, max_words=max_words,
        stopwords=stopwords,
    )
    return df.select(
        F.col(id_col), *[expr.alias(name) for name, expr in flags.items()]
    ).withColumn(
        "pass_all",
        F.lit(True)
        & F.col("r_word_count")
        & F.col("r_mean_word_len")
        & F.col("r_symbol_ratio")
        & F.col("r_bullet")
        & F.col("r_ellipsis")
        & F.col("r_alpha_words")
        & F.col("r_stopwords"),
    )


def gopher_flag_columns(
    c: Column,
    min_words: int = 15,
    max_words: int = 100_000,
    stopwords: list[str] | None = None,
) -> "dict[str, Column]":
    """The seven Gopher rule flags as PURE column expressions over a text
    column — exposed separately so stateless consumers (the streaming
    curation gate) can filter inline without the id-keyed join
    ``gopher_rules``'s frame output would force (a stream self-join)."""
    toks = F.split(c, " ")
    n_words = F.size(toks).cast("long")
    sum_wl = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / 3
    n_sym = (n_hash + n_ellipsis).cast("long")
    lines = F.split(c, "\n")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("- ") | x.startswith("* ") | x.startswith("•"),
        )
    ).cast("long")
    n_ell_lines = F.size(F.filter(lines, lambda x: x.endswith("..."))).cast("long")
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("long")
    sw = F.array(*[F.lit(s) for s in (stopwords or GOPHER_STOPWORDS)])
    n_stop_distinct = F.size(F.array_intersect(F.array_distinct(toks), sw))
    return {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (3 * n_words <= sum_wl) & (sum_wl <= 10 * n_words),
        "r_symbol_ratio": 10 * n_sym <= n_words,
        "r_bullet": 10 * n_bullet <= 9 * n_lines,
        "r_ellipsis": 10 * n_ell_lines <= 3 * n_lines,
        "r_alpha_words": 10 * n_alpha >= 8 * n_words,
        "r_stopwords": n_stop_distinct >= 2,
    }


def boilerplate_units(
    units: DataFrame,
    id_col: str = "doc_id",
    unit_col: str = "unit_key",
    min_docs: int = 3,
) -> DataFrame:
    """CROSS-corpus boilerplate detection core (the CCNet/RefinedWeb
    paragraph-hash rule): a unit whose key appears in >= ``min_docs``
    DISTINCT documents is boilerplate (nav chrome, cookie banners,
    license footers), regardless of within-doc repetition. Works over
    ANY (doc, unit-key) frame — separator lines (boilerplate_lines),
    CDC chunks (edit-stable units for unstructured text), real
    paragraphs. Returns per-document ``n_units`` / ``n_boiler``
    (occurrence-counted) / ``boiler_frac``.

    Scale shape: two hash aggregations + one key equi-join, linear in
    total unit count; the hottest key's frequency is bounded by the
    DISTINCT-doc count (countDistinct, not count), so a doc repeating
    one unit a million times cannot skew the boilerplate table. Keys
    should be digests (md5), never raw text — uniform, shuffle-friendly."""
    # one (unit, doc) pre-aggregation feeds BOTH the frequency table and
    # the per-doc rollup — the branches share its shuffle exchange
    # (ReusedExchange), so the upstream unit build (explode, CDC windows)
    # runs exactly once; ndocs is then a plain COUNT over already-distinct
    # (unit, doc) rows, no two-phase countDistinct needed
    occ = units.groupBy(unit_col, id_col).agg(F.count(F.lit(1)).alias("__occ"))
    freq = occ.groupBy(unit_col).agg(F.count(F.lit(1)).alias("__ndocs"))
    per_doc = (
        occ.join(freq, unit_col)
        .groupBy(id_col)
        .agg(
            F.sum("__occ").cast("long").alias("n_units"),
            F.sum(F.when(F.col("__ndocs") >= min_docs, F.col("__occ")).otherwise(0))
            .cast("long")
            .alias("n_boiler"),
        )
    )
    return per_doc.select(
        id_col,
        "n_units",
        "n_boiler",
        F.round(F.col("n_boiler").cast("double") / F.col("n_units"), 6).alias(
            "boiler_frac"
        ),
    )


def boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    sep_regex: str = "\\. ",
) -> DataFrame:
    """``boilerplate_units`` over separator-split lines: normalize
    (lower/trim), drop empties, key each line by md5, then apply the
    cross-doc frequency rule. Use '\\n' for line-structured corpora;
    for unstructured single-paragraph text, CDC chunks
    (operators/chunking.cdc_chunks) are the edit-stable unit — compose
    them with ``boilerplate_units`` directly (q_boilerplate_chunks)."""
    norm = lambda x: F.lower(F.trim(x))
    lines = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), sep_regex)).alias("__raw"),
        )
        .select(F.col(id_col), norm(F.col("__raw")).alias("__line"))
        .where(F.length("__line") > 0)
        .select(F.col(id_col), F.md5("__line").alias("__lk"))
    )
    return boilerplate_units(lines, id_col=id_col, unit_col="__lk", min_docs=min_docs)


# Gopher repetition-filter thresholds (Rae et al. 2021, table A1): the
# fraction of character mass allowed in the top n-gram (n = 2, 3, 4) and
# in duplicated n-grams (n = 5..10).
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def gopher_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The full Gopher repetition-filter suite (Rae et al. 2021 A1.1) per
    document: for n = 2..4 the character mass of the heaviest n-gram
    (max over grams of occurrences × gram length — the deterministic
    max-mass form of the paper's "most frequent n-gram" rule, immune to
    count ties), and for n = 5..10 the fraction of characters covered by
    any n-gram occurring twice or more (token positions covered by a
    duplicated gram, counted once, weighted by token length). Each
    fraction divides exact integer character sums and is rounded to 6dp,
    so the flags and fractions hash cross-engine; ``pass_all`` ANDs the
    nine thresholds.

    Plan shape (round 9, second pass — guide §2.4): every one of the nine
    rules is a function of ONE document's own token array, so the whole
    suite is computed ROW-LOCALLY: per n, sort the doc's gram array (for
    the top-mass rules) or its (gram, pos) struct array (for the
    dup-coverage rules), run-length the sorted array with higher-order
    functions, and fold masses / covered-position char sums per row. The
    first round-9 form had already made the gram frames row-local but
    still exploded them through two corpus-wide hash-aggregate families,
    a semi-join, a distinct and a (doc, pos)-keyed length join — measured
    at sf0.1 those exchanges were ~1.1 s of the 1.59 s total. This form
    is a pure map: ZERO exchanges beyond the parallelism guard
    (tests/test_plan_quality.py pins the shape). Exact-integer
    equivalence: run counts over a sorted gram array ARE the per-gram
    occurrence counts; max/sum over them are order-independent; covered
    positions are array_distinct'd per (doc, n) exactly as the former
    DISTINCT did per (n, doc, pos); per-doc char totals stay row-local
    arithmetic (len(text) − (n_tokens − 1) for single-space splits).
    Skew bound: per-row work is O(tokens·n log tokens), bounded by the
    longest document — same bound as every gram pipeline in this repo."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    top_ns = sorted(GOPHER_TOP_NGRAM_MAX)
    dup_ns = sorted(GOPHER_DUP_NGRAM_MAX)
    src = ensure_min_parallelism(
        df.select(F.col(id_col), F.col(text_col)), id_col
    ).select(
        F.col(id_col),
        F.col(text_col).alias("__txt"),
        F.split(F.col(text_col), " ").alias("__tk"),
    ).where(F.col("__tk").isNotNull())
    tk, sz = F.col("__tk"), F.size(F.col("__tk"))
    # split on every single space ⇒ separators = n_tokens − 1, so the
    # summed token length is len(text) − (n_tokens − 1): row-local, exact
    total_chars = (F.length("__txt") - sz + 1).cast("long")

    def top_mass(n: int) -> Column:
        # heaviest n-gram char mass: run-length the sorted gram array;
        # mass(run) = run_count × (gram chars = len(gram) − (n−1) spaces)
        grams = F.when(
            sz >= n,
            F.transform(
                F.sequence(F.lit(0), sz - n),
                lambda p: F.array_join(F.slice(tk, p + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

        def from_sorted(sg: Column) -> Column:
            g_sz = F.size(sg)
            starts_expr = F.filter(
                F.sequence(F.lit(1), g_sz),
                lambda i: (i == F.lit(1)) | (F.get(sg, i - 1) != F.get(sg, i - 2)),
            )

            def from_starts(st: Column) -> Column:
                ends = F.concat(
                    F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
                    F.array(g_sz + 1),
                )
                masses = F.zip_with(
                    ends,
                    st,
                    lambda e, s: (e - s).cast("long")
                    * (F.length(F.get(sg, s - 1)) - (n - 1)),
                )
                return F.array_max(masses)

            # sequence(1, 0) would count DOWN — guard the empty array
            return F.when(g_sz > 0, _bind(starts_expr, from_starts)).otherwise(
                F.lit(0).cast("long")
            )

        return _bind(F.array_sort(grams), from_sorted)

    def dup_chars(n: int) -> Column:
        # chars covered by any n-gram occurring ≥2 times: sort (gram, pos)
        # structs, mark positions whose gram equals a sorted neighbor
        # (F.get is 0-based/null-safe, so the boundary probes compare
        # against null and drop out), expand each dup start to its n
        # token positions, distinct, sum token lengths
        pg = F.when(
            sz >= n,
            F.transform(
                F.sequence(F.lit(0), sz - n),
                lambda p: F.struct(
                    F.array_join(F.slice(tk, p + 1, n), " ").alias("g"),
                    p.alias("p"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<g:string,p:int>>"))

        def from_sorted(sp: Column) -> Column:
            g_sz = F.size(sp)
            dup_pos = F.filter(
                F.transform(
                    F.sequence(F.lit(1), g_sz),
                    lambda i: F.when(
                        (F.get(sp, i - 1)["g"] == F.get(sp, i - 2)["g"])
                        | (F.get(sp, i - 1)["g"] == F.get(sp, i)["g"]),
                        F.get(sp, i - 1)["p"],
                    ),
                ),
                lambda x: x.isNotNull(),
            )
            covered = F.array_distinct(
                F.flatten(
                    F.transform(dup_pos, lambda p: F.sequence(p, p + n - 1))
                )
            )
            chars_n = F.aggregate(
                covered,
                F.lit(0).cast("long"),
                lambda a, p: a + F.length(F.element_at(tk, p + 1)).cast("long"),
            )
            return F.when(g_sz > 0, chars_n).otherwise(F.lit(0).cast("long"))

        return _bind(F.array_sort(pg), from_sorted)

    # stage the integer masses/char-sums as materialized columns first, so
    # the frac/flag expressions below reference cheap columns instead of
    # re-embedding the fold trees (CollapseProject keeps the projections
    # separate because the references are non-cheap and repeated)
    staged = src.select(
        F.col(id_col),
        total_chars.alias("__total_chars"),
        *[top_mass(n).alias(f"__top{n}_mass") for n in top_ns],
        *[dup_chars(n).alias(f"__dup{n}_chars") for n in dup_ns],
    )

    cols = [F.col(id_col)]
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
    return staged.select(*cols, acc.alias("pass_all"))