"""robots.txt evaluation (RFC 9309 Robots Exclusion Protocol) — the
crawl-POLITENESS gate between URL canonicalization (urltools.py) and
fetching/retro-filtering: training-data pipelines apply robots rules
retroactively (a page whose site disallows crawling is dropped from the
corpus even if an archive contains it).

Two halves, both Spark-shaped for the 100 TB case:

* ``robots_rules``: parse per-host robots.txt TEXT into a (host, rule
  rows) dim table — group lines under their ``User-agent:`` headers,
  keep ``Allow:``/``Disallow:`` directives. robots.txt files are a
  per-HOST dim (millions of rows at web scale, kilobytes each), so the
  parse is a bounded mapInPandas over the dim, never over the corpus.
* ``robots_gate``: evaluate every URL against its host's rules with the
  RFC 9309 longest-match rule — among all rules whose path-prefix
  matches the URL path, the LONGEST prefix wins; ties prefer Allow; no
  matching rule (or no rules for the host) means allowed; an empty
  ``Disallow:`` value matches nothing. Pure relational: URLs join the
  (broadcastable) rule dim on host, prefix tests are ``startswith``
  column expressions, and the winner is one max_by aggregate per URL —
  no UDF in the per-URL path, no window over the corpus.

Scope: exact-prefix rules (the overwhelming majority in the wild);
``*``/``$`` wildcard patterns are intentionally out of scope and raise
ValueError at parse time rather than silently mis-evaluating — the
fail-closed discipline of the codec family. Agent-group selection keeps
the matched-agent rows the caller asks for (default ``*``).

Reference scope note: /root/reference has no crawl ingestion; this
module is part of the LLM-training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots_txt(text: str, agent: str = "*") -> "list[tuple[str, str]]":
    """(rule_type, path_prefix) rows for the given agent group of ONE
    robots.txt body. Pure function (driver- or worker-side). Groups:
    consecutive ``User-agent:`` lines open a group; the group's
    directives apply to every listed agent. Unknown directives
    (Crawl-delay, Sitemap, comments, blanks) are skipped. Wildcard
    patterns raise ValueError (documented scope)."""
    rules: list[tuple[str, str]] = []
    current_agents: list[str] = []
    in_group_header = True
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            raise ValueError(f"malformed robots.txt line: {raw_line!r}")
        key, value = line.split(":", 1)
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_group_header:
                current_agents = []
                in_group_header = True
            current_agents.append(value.lower())
        elif key in ("allow", "disallow"):
            in_group_header = False
            if "*" in value or value.endswith("$"):
                raise ValueError(
                    f"wildcard robots patterns out of scope: {value!r}"
                )
            if agent.lower() in current_agents:
                # empty Disallow matches nothing (explicit allow-all)
                if value:
                    rules.append((key, value))
        else:
            in_group_header = False
    return rules


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Explode per-host robots.txt bodies into the rule dim:
    (host, rule_type, path_prefix, prefix_len). mapInPandas over the
    HOST dim (bounded), broadcastable downstream."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            out = {"host": [], "rule_type": [], "path_prefix": []}
            for host, text in zip(pdf["host"], pdf["__txt"]):
                for rule_type, prefix in parse_robots_txt(str(text), agent):
                    out["host"].append(host)
                    out["rule_type"].append(rule_type)
                    out["path_prefix"].append(prefix)
            yield pd.DataFrame(out)

    return (
        robots.select(
            robots[host_col].alias("host"), robots[text_col].alias("__txt")
        )
        .mapInPandas(
            parse, schema="host string, rule_type string, path_prefix string"
        )
        .withColumn("prefix_len", F.length("path_prefix"))
    )


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Append ``allowed`` (boolean) to a URL frame by RFC 9309
    longest-match against the rule dim: left-join on host (hosts without
    rules stay allowed), keep matching-prefix rules, pick the winner
    with ONE max_by aggregate ordered by (prefix_len, is_allow) — the
    tie at equal length prefers Allow per the RFC. The rule dim is tiny
    relative to the corpus: broadcast join, no corpus shuffle beyond the
    per-URL aggregate. Exact-duplicate URL rows collapse through the
    aggregate — the normal crawl-frontier shape is distinct URLs."""
    c = F.col(url_col)
    path = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    host = F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(host, r":\d+$", "")
    keyed = urls.withColumn("__host", host).withColumn("__path", path)
    joined = keyed.join(
        F.broadcast(rules.withColumnRenamed("host", "__host")),
        "__host",
        "left",
    )
    matches = F.when(
        F.col("path_prefix").isNotNull()
        & F.col("__path").startswith(F.col("path_prefix")),
        F.struct(
            F.col("prefix_len").alias("l"),
            # Allow outranks Disallow at equal length: encode as the
            # second sort key of the max_by tuple
            (F.col("rule_type") == "allow").cast("int").alias("a"),
        ),
    )
    verdict = (
        joined.groupBy(*[F.col(x) for x in keyed.columns])
        .agg(
            F.max_by(
                F.when(matches.isNotNull(), F.col("rule_type")),
                matches,
            ).alias("__winner")
        )
        .withColumn(
            "allowed",
            F.coalesce(F.col("__winner") != "disallow", F.lit(True)),
        )
        .drop("__winner", "__host", "__path")
    )
    return verdict
