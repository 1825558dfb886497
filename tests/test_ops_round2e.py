"""Round-2e operator properties: substring-dedup removal, deterministic
split assignment, pairwise series correlation (oracle parity at sf0.001
lives in test_oracle_parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.dedup import strip_duplicate_chunks
from fortune_500_financial_insights_pipeline_spark.operators.sampling import split_assign


def test_strip_duplicate_chunks_removes_planted_boilerplate(spark):
    boiler = " ".join(f"b{i}" for i in range(20))          # one full chunk
    uniq1 = " ".join(f"x{i}" for i in range(20))
    uniq2 = " ".join(f"y{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + uniq1),
            (2, boiler + " " + uniq2),
            (3, uniq1),  # whole-chunk copy of doc 1's tail -> also duplicated
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in strip_duplicate_chunks(docs, chunk_words=20, min_docs=2).collect()
    }
    # boiler chunk (docs 1+2) and uniq1 chunk (docs 1+3) are corpus-dups
    assert out[1]["clean_text"] == ""
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 0
    assert out[2]["clean_text"] == uniq2
    assert out[2]["n_kept"] == 1
    assert out[3]["clean_text"] == "" and out[3]["n_chunks"] == 1


def test_strip_duplicate_chunks_preserves_order_and_within_doc_dups(spark):
    c1 = " ".join(f"a{i}" for i in range(20))
    c2 = " ".join(f"b{i}" for i in range(20))
    # within-doc repetition is ONE distinct doc -> kept (corpus-level rule)
    docs = spark.createDataFrame(
        [(7, " ".join([c1, c2, c1]))], "doc_id long, text string"
    )
    row = strip_duplicate_chunks(docs, chunk_words=20, min_docs=2).collect()[0]
    assert row["clean_text"] == " ".join([c1, c2, c1])
    assert row["n_chunks"] == 3 and row["n_kept"] == 3


def test_split_assign_is_exhaustive_stable_and_proportional(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    once = split_assign(d, ["doc_id"], splits)
    counts = {r["split"]: r["n"] for r in once.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    assert n == d.count()                       # every row assigned
    assert counts.get("train", 0) > counts.get("val", 0)
    # repartitioning must not move any row between splits
    again = split_assign(d.repartition(7), ["doc_id"], splits)
    assert once.select("doc_id", "split").exceptAll(
        again.select("doc_id", "split")).count() == 0


def test_split_assign_rejects_bad_fractions(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        split_assign(df, ["id"], {"train": 0.5, "val": 0.2})
