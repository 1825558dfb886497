"""Round-6 extension queries: the exact substring-dedup primitive
(distributed suffix array + LCP spans) under oracle hash rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.queries._core import q


@q("q_suffix_array")
def q_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed generalized suffix array certified cross-engine: the
    prefix-doubling loop (operators/suffix.suffix_array_tokens —
    O(log maxlen) rounds, each a (doc,pos) self-join + range-partitioned
    global dense rank with mapInPandas local ranks and offset folds; no
    single-partition window anywhere) must reproduce EXACTLY the rank
    that brute-force lexicographic suffix sorting assigns. The oracle IS
    that brute force: DuckDB materializes every suffix of documents
    doc_id < 40 as a string (valid because joining tokens with ' ' is
    order-isomorphic to token-sequence comparison when the separator
    sorts below all token characters) and ROW_NUMBERs them with the same
    (suffix, doc, pos) tie-break. A hash match proves ~2,100 global
    ranks byte-for-byte — the Lee et al. 2022 exact-substring-dedup
    primitive, scale path included (suffix strings are never
    materialized on the Spark side)."""
    from fortune_500_financial_insights_pipeline_spark.queries._core import (
        doc_suffix_sa,
    )

    return doc_suffix_sa(spark, sf_dir).select("doc_id", "pos", "sa_rank")


@q("q_suffix_lcp_spans")
def q_suffix_lcp_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT duplicated token spans from the suffix array: adjacent-in-SA
    suffix pairs with their longest common prefix (length >= 3 tokens)
    and the span text itself (operators/suffix.suffix_lcp_spans — the
    LCP is a first-mismatch fold over zipped token arrays, JVM-side).
    This is substring-level dedup made exact where the CDC-chunk family
    (q_boilerplate_*) is approximate: every maximal repeated span
    appears as an adjacent SA pair, so the table is the complete
    repeated-span inventory of the corpus slice. The oracle replays the
    brute-force sort plus a SQL first-mismatch scan over the same
    zipped token lists."""
    from fortune_500_financial_insights_pipeline_spark.operators.suffix import (
        suffix_lcp_spans,
    )
    from fortune_500_financial_insights_pipeline_spark.queries._core import (
        doc_suffix_sa,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    return suffix_lcp_spans(
        d, min_lcp=3, sa=doc_suffix_sa(spark, sf_dir), hint_small=True
    ).select("doc_a", "pos_a", "doc_b", "pos_b", "lcp", "span")


@q("q_substring_dup_coverage")
def q_substring_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document EXACT substring-duplication coverage — the Lee et
    al. 2022 readout that decides what substring dedup would remove:
    for every suffix whose SA-adjacent neighbor shares >= 3 tokens, the
    shared span's token positions are marked; ``dup_tokens`` is the
    size of the UNION of marked positions per document and ``dup_frac``
    its share of the document. Exact and maximal where q_dup_spans'
    fixed-n window hashing is approximate. Built from the shared
    suffix-array memo + the LCP pair table: explode both pair sides'
    position ranges, distinct, one count per doc; docs with no repeated
    span >= 3 report 0. The oracle replays the brute sort with
    LAG/LEAD first-mismatch scans (per-suffix coverage = the max of its
    eligible adjacent LCPs — identical to the pair-range union)."""
    from fortune_500_financial_insights_pipeline_spark.operators.suffix import (
        suffix_lcp_spans,
    )
    from fortune_500_financial_insights_pipeline_spark.queries._core import (
        doc_suffix_sa,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    pairs = suffix_lcp_spans(
        d, min_lcp=3, sa=doc_suffix_sa(spark, sf_dir), hint_small=True
    )
    span_end = lambda pos: F.col(pos) + F.col("lcp").cast("int") - 1  # noqa: E731
    cov = (
        pairs.select(
            F.col("doc_a").alias("doc_id"),
            F.explode(F.sequence("pos_a", span_end("pos_a"))).alias("p"),
        )
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_id"),
                F.explode(F.sequence("pos_b", span_end("pos_b"))).alias("p"),
            )
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("dup_tokens"))
    )
    toks = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return toks.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)).cast("double") / F.col("n_tokens"), 6
        ).alias("dup_frac"),
    )


@q("q_substring_dup_strip")
def q_substring_dup_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-dedup REMOVAL, byte-certified (the
    q_boilerplate_strip pattern applied to the suffix-exact family):
    every token position covered by a >=3-token repeated span (the
    q_substring_dup_coverage union) is dropped and each document is
    RECONSTRUCTED from its surviving tokens in order — per doc:
    surviving token count and the md5 of the cleaned text, so the hash
    row certifies the removal byte-for-byte. Documents with every token
    covered drop out, like any curation filter. Plan: the shared SA
    memo + LCP pairs, position explode + distinct, one anti-join
    against the token frame, ordered array_sort reassembly — no window
    over raw text, no driver collect."""
    from fortune_500_financial_insights_pipeline_spark.operators.suffix import (
        suffix_lcp_spans,
    )
    from fortune_500_financial_insights_pipeline_spark.queries._core import (
        doc_suffix_sa,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    pairs = suffix_lcp_spans(
        d, min_lcp=3, sa=doc_suffix_sa(spark, sf_dir), hint_small=True
    )
    span_end = lambda pos: F.col(pos) + F.col("lcp").cast("int") - 1  # noqa: E731
    cov = (
        pairs.select(
            F.col("doc_a").alias("doc_id"),
            F.explode(F.sequence("pos_a", span_end("pos_a"))).alias("pos"),
        )
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_id"),
                F.explode(F.sequence("pos_b", span_end("pos_b"))).alias("pos"),
            )
        )
        .distinct()
    )
    toks = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )
    kept = toks.join(cov, ["doc_id", "pos"], "left_anti")
    cleaned = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))),
            lambda s: s["tok"],
        ),
    )
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("kept_tokens"),
        F.md5(cleaned).alias("kept_md5"),
    )


@q("q_stft_spectrogram")
def q_stft_spectrogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio DSP certified cross-engine: per document (doc_id <
    30), a 32-sample PCM signal — pcm[i] = ((d·37 + i·13) mod 2048) −
    1024 — is containerized as genuine 16-bit WAV (the codec the
    roundtrip keys certify), decoded back, and pushed through the
    PRODUCTION STFT operator (operators/dsp.stft_power_frames): frames
    of 8 samples every 4, per-frame 8-point DFT with closed-form
    twiddles ({0, ±1, ±√½} — never libm trig), power = re² + im². The
    accumulation order is pinned left-associative, so the oracle
    replays the identical double-precision chain in SQL and the hash
    match proves 1,050 spectrogram cells bit-for-bit: a Fourier
    transform as an oracle-checkable relational operator. mapInPandas,
    map-only, no shuffle."""
    import numpy as np
    import pandas as pd

    from fortune_500_financial_insights_pipeline_spark.operators.dsp import (
        stft_power_frames,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 30)
        .select("doc_id")
        .distinct()
    )

    def build(batches):
        from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
            wav_encode_pcm16,
        )

        for pdf in batches:
            out = {"doc_id": [], "media": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                i = np.arange(32)
                pcm = (((d * 37 + i * 13) % 2048) - 1024).astype(np.int16)
                out["doc_id"].append(d)
                out["media"].append(wav_encode_pcm16(pcm, 8000))
            yield pd.DataFrame(out)

    media = ids.mapInPandas(build, schema="doc_id long, media binary")
    sg = stft_power_frames(media)
    return sg.select(
        "doc_id",
        "frame",
        "bin",
        F.round("re", 6).alias("re"),
        F.round("im", 6).alias("im"),
        F.round("power", 6).alias("power"),
    )


@q("q_image_phash_dedup")
def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup dedup via an engine-exact perceptual hash: per
    document (doc_id < 25), a 16×16 gray image whose SAMPLED 8×8 plane
    is a sum of 15 integer-cosine basis terms — sub(y, x) = 128 +
    Σ_i s_i·W[(ky_i·y) mod 8]·W[(kx_i·x) mod 8] with W = 2·cos table
    [2,1,0,-1,-2,-1,0,1] and per-doc signs s_i from bit i of d·7919 —
    AND a planted near-duplicate (doc_id + 100000: sampled pixel (6,6)
    brightened one level) are encoded as genuine PNGs and pushed
    through the PRODUCTION operator dsp.image_spectral_hash (real
    decode → 8×8 nearest subsample → exact 2-D 8-point DFT → 15
    low-band sign bits). The hash RECOVERS the planted sign pattern
    exactly (25 distinct hashes), every planted pair collides into a
    2-bucket (the near-dup semantics the hash exists for), and every
    double stays bit-replayable: the oracle regenerates the pixel
    formula and both DFT passes as the same left-associative chains
    (row pass inline, column pass over y-ordered lists). One groupBy on
    the 15-bit hash — the bucket join IS the dedup plan at any
    scale."""
    import numpy as np
    import pandas as pd

    from fortune_500_financial_insights_pipeline_spark.operators.dsp import (
        image_spectral_hash,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 25)
        .select("doc_id")
        .distinct()
    )

    def build(batches):
        from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
            png_encode,
        )

        for pdf in batches:
            out = {"doc_id": [], "media": []}
            from fortune_500_financial_insights_pipeline_spark.operators.dsp import (
                PHASH_LOW_BAND,
            )

            W = [2, 1, 0, -1, -2, -1, 0, 1]
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                sub = np.zeros((8, 8), np.int64)
                for i, (ky, kx) in enumerate(PHASH_LOW_BAND):
                    s = 1 if ((d * 7919) >> i) & 1 else -1
                    for yy in range(8):
                        for xx in range(8):
                            sub[yy, xx] += s * W[(ky * yy) % 8] * W[(kx * xx) % 8]
                img = np.full((16, 16), 128, np.int64)
                img[::2, ::2] = 128 + sub  # range 68..188: no clipping
                out["doc_id"].append(d)
                out["media"].append(png_encode(img.astype(np.uint8)))
                pert = img.copy()
                pert[6, 6] += 1  # sampled cell (3,3); 189 max, no wrap
                out["doc_id"].append(d + 100000)
                out["media"].append(png_encode(pert.astype(np.uint8)))
            yield pd.DataFrame(out)

    media = ids.mapInPandas(build, schema="doc_id long, media binary")
    hashes = image_spectral_hash(media)
    counts = hashes.groupBy("phash").agg(
        F.count(F.lit(1)).cast("long").alias("n_bucket")
    )
    return hashes.join(counts, "phash").select("doc_id", "phash", "n_bucket")


def _synth_page(d: int, text: str) -> str:
    """Shared fixture page generator for the web-pipeline keys: title +
    style/script junk + 3-link nav + escaped 15-token <p> paragraphs
    (paragraph 0 carries a planted ' A&amp;B' entity) + an all-link ad
    aside + an &copy; footer. Both oracles replay THIS function."""
    import html as html_mod

    toks = text.split(" ")
    paras = [" ".join(toks[i : i + 15]) for i in range(0, len(toks), 15)]
    body = []
    for k, para in enumerate(paras):
        esc = html_mod.escape(para)
        if k == 0:
            esc += " A&amp;B"
        body.append(f"<p>{esc}</p>")
    return (
        f"<html><head><title>Doc {d}</title>"
        "<style>p {color: red}</style>"
        "<script>var x = 1 < 2;</script></head><body>"
        "<nav><a href='/'>Home</a> <a href='/about'>About</a> "
        "<a href='/contact'>Contact</a></nav>"
        + "".join(body)
        + f"<aside><a href='/ad'>Buy product {d} now with a "
        "great discount today</a></aside>"
        "<footer>&copy; 2026 Example Corp</footer></body></html>"
    )


@q("q_html_main_extract")
def q_html_main_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML main-content extraction certified cross-engine — the web
    pipeline's FIRST stage (WET/trafilatura class) under a hash row:
    per document (doc_id < 40), a full page is synthesized — title,
    style + script junk (incl. a raw '<' inside the script CDATA), a
    3-link nav, the document's text as escaped <p> paragraphs of 15
    tokens (paragraph 0 carries a planted ' A&amp;B' entity), a
    46-char all-link ad aside (dropped by link DENSITY, not length),
    and an &copy; footer — and parsed by the REAL stdlib-HTMLParser
    operator (operators/html.html_main_text): script/style skipped,
    entities decoded, block segmentation, and the jusText/Arc90 keep
    rule (>= 30 chars, link density < 0.33). The oracle replays the
    page GENERATOR (chunking, entity decode, whitespace collapse, the
    same keep rule) — a hash match proves the parser recovered exactly
    the planted main text and dropped exactly the planted boilerplate.
    mapInPandas, map-only, no shuffle."""
    import pandas as pd

    from fortune_500_financial_insights_pipeline_spark.operators.html import (
        html_main_text,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )

    def build(batches):
        for pdf in batches:
            out = {"doc_id": [], "html": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                out["doc_id"].append(int(doc_id))
                out["html"].append(_synth_page(int(doc_id), text))
            yield pd.DataFrame(out)

    pages = docs.mapInPandas(build, schema="doc_id long, html string")
    return html_main_text(pages)


@q("q_url_canonical_dedup")
def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL dedup certified cross-engine: per document
    (doc_id < 200), four raw URL variants — a SHOUTING host with
    explicit :80 + utm_source + fragment, a clean form, a
    tracking-and-shuffled-params form, and one genuinely distinct URL
    (https, different path, :443 to strip) — run through the pure
    column-expression canonicalizer (operators/urltools.canonicalize_url:
    lowercase scheme/host, default-port strip, fragment drop, tracking
    params removed, remaining params byte-sorted; no UDF, codegen'd).
    Output: one row per canonical URL with n_raw (the dedup fold) and
    the host grouping key — the first three variants MUST collapse to
    one canonical form (n_raw 3) and the fourth stand alone (n_raw 1).
    The oracle replays every rule in SQL string ops."""
    from fortune_500_financial_insights_pipeline_spark.operators.urltools import (
        canonicalize_url,
        url_host,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    k = (F.col("doc_id") % 7).cast("long")
    raws = d.select(
        F.col("doc_id"),
        F.explode(
            F.array(
                F.concat(
                    F.lit("HTTP://Example"), k, F.lit(".COM:80/path/"),
                    F.col("doc_id"), F.lit("?b=2&utm_source=x&a=1#frag"),
                ),
                F.concat(
                    F.lit("http://example"), k, F.lit(".com/path/"),
                    F.col("doc_id"), F.lit("?a=1&b=2"),
                ),
                F.concat(
                    F.lit("http://example"), k, F.lit(".com:80/path/"),
                    F.col("doc_id"), F.lit("?utm_campaign=y&b=2&a=1"),
                ),
                F.concat(
                    F.lit("https://Example"), k, F.lit(".com:443/other/"),
                    F.col("doc_id"), F.lit(""),
                ),
            )
        ).alias("raw"),
    )
    canon = raws.select(
        "doc_id",
        canonicalize_url("raw").alias("canon_url"),
        url_host("raw").alias("host"),
    )
    return (
        canon.groupBy("canon_url", "host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
    )


@q("q_web_pipeline_e2e")
def q_web_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole web-corpus front half COMPOSED and certified in one
    row: raw crawl URLs → canonical dedup (4 variants per doc → 2
    fetches, operators/urltools) → real HTML main-content extraction
    (operators/html, both canonical URLs serve the same page) →
    content-fingerprint dedup (the two fetches collapse; so do any
    byte-identical cross-doc texts) → quality gate (round-6 score >=
    0.5 on the space-joined main) → 32/8 token chunking — with funnel
    counts at every stage and an order-invariant md5-prefix checksum
    over the final chunk texts. Every stage is individually certified
    by its own key (q_url_canonical_dedup, q_html_main_extract,
    q_curation_stream_funnel); this key certifies their COMPOSITION:
    the oracle replays URL math, the page generator, the keep rule, the
    dedup folds, the quality formula, and the chunk windows end-to-end.
    Stages are map-only plus two small dedup shuffles and one chunk
    aggregate — the 100 TB shape of the real pipeline."""
    import pandas as pd

    from fortune_500_financial_insights_pipeline_spark.operators.chunking import (
        chunk_documents,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.html import (
        html_main_content,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        quality_score,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.urltools import (
        canonicalize_url,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )

    def build(batches):
        for pdf in batches:
            out = {"doc_id": [], "html": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                out["doc_id"].append(int(doc_id))
                out["html"].append(_synth_page(int(doc_id), text))
            yield pd.DataFrame(out)

    pages = docs.mapInPandas(build, schema="doc_id long, html string")
    k = (F.col("doc_id") % 7).cast("long")
    raws = pages.select(
        "doc_id",
        "html",
        F.explode(
            F.array(
                F.concat(F.lit("HTTP://Example"), k, F.lit(".COM:80/page/"),
                         F.col("doc_id"), F.lit("?b=2&utm_source=x&a=1#f")),
                F.concat(F.lit("http://example"), k, F.lit(".com/page/"),
                         F.col("doc_id"), F.lit("?a=1&b=2")),
                F.concat(F.lit("http://example"), k, F.lit(".com:80/page/"),
                         F.col("doc_id"), F.lit("?utm_campaign=y&b=2&a=1")),
                F.concat(F.lit("https://example"), k, F.lit(".com/amp/"),
                         F.col("doc_id"), F.lit("")),
            )
        ).alias("raw"),
    )
    canon = raws.withColumn("canon_url", canonicalize_url("raw"))
    fetches = canon.select("doc_id", "canon_url", "html").dropDuplicates(
        ["canon_url"]
    )
    extracted = html_main_content(fetches, url_col="canon_url")
    content = extracted.select(
        "url", F.regexp_replace("main", "\n", " ").alias("main_sp")
    ).withColumn("fp", F.md5("main_sp"))
    contents = content.select("fp", "main_sp").dropDuplicates(["fp"])
    gated = contents.where(F.round(quality_score("main_sp"), 6) >= 0.5)
    chunks = chunk_documents(
        gated, id_col="fp", text_col="main_sp", chunk_tokens=32, overlap=8
    )
    csum = F.conv(F.substring(F.md5("chunk_text"), 1, 8), 16, 10).cast("long")
    one = F.lit(1)
    a_raw = raws.agg(F.count(one).cast("long").alias("n_raw_urls"))
    a_fetch = fetches.agg(F.count(one).cast("long").alias("n_fetches"))
    a_content = contents.agg(F.count(one).cast("long").alias("n_contents"))
    a_gated = gated.agg(F.count(one).cast("long").alias("n_pass_quality"))
    a_chunks = chunks.agg(
        F.count(one).cast("long").alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("sum_chunk_tokens"),
        F.sum(csum).cast("long").alias("chunk_checksum"),
    )
    return (
        a_raw.crossJoin(F.broadcast(a_fetch))
        .crossJoin(F.broadcast(a_content))
        .crossJoin(F.broadcast(a_gated))
        .crossJoin(F.broadcast(a_chunks))
    )


@q("q_audio_ahash_dedup")
def q_audio_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup dedup via an engine-exact spectral fingerprint —
    completing modality symmetry (text minhash / image phash / audio
    ahash): per document (doc_id < 25), a 32-sample PCM mix of three
    8-periodic integer tones under a stepped per-doc amplitude
    envelope — pcm[i] = Σ_b A_b(i)·T_b[i mod 8] with
    A_b(i) = 1000·(1 + (d·7919 div 4^b + i div 4) mod 4) and the
    integer 2·cos tables for bins 1..3 — AND a planted near-duplicate
    (doc_id + 100000: sample 5 nudged by one quantization level) are
    containerized as real WAV and pushed through
    dsp.audio_spectral_hash (real decode → exact 8/4 STFT → 21 ordinal
    band-energy bits). Adjacent band powers are separated by ≥5e-3
    while the one-level nudge moves them ~1e-4 (a 50× sign margin), so
    EVERY planted pair collides into its bucket; clips sharing ordinal
    spectral structure bucket together (10 structural groups over the
    25 docs), which is exactly what a perceptual bucket key is for. The
    oracle replays the envelope formula and the DFT chains. One groupBy
    on the hash — the bucket join IS the dedup plan."""
    import numpy as np
    import pandas as pd

    from fortune_500_financial_insights_pipeline_spark.operators.dsp import (
        audio_spectral_hash,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 25)
        .select("doc_id")
        .distinct()
    )

    def build(batches):
        from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
            wav_encode_pcm16,
        )

        tones = [
            [2, 1, 0, -1, -2, -1, 0, 1],
            [1, 0, -1, 0, 1, 0, -1, 0],
            [2, -1, 0, 1, -2, 1, 0, -1],
        ]
        for pdf in batches:
            out = {"doc_id": [], "media": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                i = np.arange(32)
                pcm = np.zeros(32, np.int64)
                for b in range(3):
                    amp = 1000 * (1 + ((d * 7919 // 4 ** b + i // 4) % 4))
                    pcm += amp * np.asarray(tones[b])[i % 8]
                out["doc_id"].append(d)
                out["media"].append(wav_encode_pcm16(pcm.astype(np.int16), 8000))
                pert = pcm.copy()
                pert[5] += 1
                out["doc_id"].append(d + 100000)
                out["media"].append(wav_encode_pcm16(pert.astype(np.int16), 8000))
            yield pd.DataFrame(out)

    media = ids.mapInPandas(build, schema="doc_id long, media binary")
    hashes = audio_spectral_hash(media)
    counts = hashes.groupBy("ahash").agg(
        F.count(F.lit(1)).cast("long").alias("n_bucket")
    )
    return hashes.join(counts, "ahash").select("doc_id", "ahash", "n_bucket")
