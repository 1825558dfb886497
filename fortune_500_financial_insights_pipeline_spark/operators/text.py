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


def word_ngrams(text: Column | str, n: int = 2) -> Column:
    """Distinct word n-grams as an array (0-indexed array lambda —
    JVM-side, no UDF)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(gram)


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
