"""Round-8 extension queries: RFC 9309 wildcard robots evaluation with
per-host quarantine, and the composed crawl pipeline, under oracle hash
rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.queries._core import q


@q("q_robots_wildcard")
def q_robots_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 WILDCARD robots evaluation certified cross-engine — the
    round-8 extension of q_robots_gate covering the three §2.2.3
    wildcard shapes, the named-agent '*'-group fallback (§2.2.1), and
    the per-host quarantine (fail closed per host, never job-fatal).
    Per document (doc_id < 200, host = example{doc_id mod 5}.com),
    four URLs: /page/{d}?x=1 (hits ``Disallow: /*?``),
    /search?safe={d} (the LONGER ``Allow: /search?safe=*`` re-opens
    it), /img/{d}.gif (hits the $-anchored ``Disallow: /*.gif$``), and
    /cart (hits the exact-anchor ``Disallow: /cart$``). Hosts k in
    {0,1,2} publish the wildcard body under ``User-agent: *`` while the
    gate asks for agent 'trainingbot' — zero rules unless the fallback
    works; host k=3 publishes a MALFORMED body (no-colon line) and must
    be quarantined to disallow-all with the audit flag; host k=4
    publishes none (all allowed). The engine runs the REAL parser +
    regex translation + broadcast longest-match gate; the oracle
    replays the expected verdict per URL shape. Output: one row per
    host with URL/allow/block/quarantine counts."""
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_gate,
        robots_rules,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    k = (F.col("doc_id") % 5).cast("long")
    base = F.concat(F.lit("http://example"), k, F.lit(".com"))
    urls = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(base, F.lit("/page/"), F.col("doc_id"), F.lit("?x=1")),
                F.concat(base, F.lit("/search?safe="), F.col("doc_id")),
                F.concat(base, F.lit("/img/"), F.col("doc_id"), F.lit(".gif")),
                F.concat(base, F.lit("/cart")),
            )
        ).alias("url"),
    )
    wildcard_body = (
        "User-agent: badbot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /*?\nAllow: /search?safe=*\n"
        "Disallow: /*.gif$\nDisallow: /cart$\n"
    )
    malformed_body = "User-agent *\nthis line has no colon\n"
    hosts = (
        spark.range(4)
        .select(
            F.concat(F.lit("example"), F.col("id"), F.lit(".com")).alias("host"),
            F.when(F.col("id") == 3, F.lit(malformed_body))
            .otherwise(F.lit(wildcard_body))
            .alias("robots_txt"),
        )
    )
    rules = robots_rules(hosts, agent="trainingbot")
    gated = robots_gate(urls, rules)
    host = F.regexp_extract("url", r"^http://([^/?]*)[/?]", 1)
    return (
        gated.groupBy(host.alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum(F.when(F.col("allowed"), 1).otherwise(0))
            .cast("long").alias("n_allowed"),
            F.sum(F.when(~F.col("allowed"), 1).otherwise(0))
            .cast("long").alias("n_blocked"),
            F.sum(F.when(F.col("quarantined_host"), 1).otherwise(0))
            .cast("long").alias("n_quarantined"),
        )
    )
