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
  A host whose robots.txt does not parse is QUARANTINED — one
  synthetic disallow-all rule with ``quarantined = true`` — instead of
  failing the job: at web scale one malformed host must not kill the
  gate for the other millions (fail closed per host, not per job).
* ``robots_gate``: evaluate every URL against its host's rules with the
  RFC 9309 longest-match rule — among all rules whose pattern matches
  the URL path, the one with the LONGEST pattern wins; ties prefer
  Allow; no matching rule (or no rules for the host) means allowed; an
  empty ``Disallow:`` value matches nothing. Pure relational: URLs join
  the (broadcastable) rule dim on host; plain-prefix rules (the
  overwhelming majority in the wild) test with a ``startswith`` column
  expression, wildcard rules with ``regexp_like`` against their
  pre-translated anchored regex (compiled once per rule dim row, not
  per URL, on the tiny wildcard subset); the winner is one max_by
  aggregate per URL — no UDF in the per-URL path, no window over the
  corpus.

Wildcard semantics (RFC 9309 §2.2.3): ``*`` matches any character
sequence (including empty); a trailing ``$`` anchors the end of the
path; a non-trailing ``$`` is a literal octet. Match priority is the
raw pattern length (the RFC's "most specific = longest" rule applied
to patterns, as in Google's reference matcher).

Agent-group selection (RFC 9309 §2.2.1): rules are taken from the
groups that explicitly name the requested agent; only when NO group
names it do the ``*`` groups apply. Unknown directives (Crawl-delay,
Sitemap, …) are ignored WITHOUT interrupting a group — a Sitemap line
between two ``User-agent:`` lines does not split the header.

Reference scope note: /root/reference has no crawl ingestion; this
module is part of the LLM-training-data extension surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = (
    "host string, rule_type string, path_prefix string, "
    "pattern_re string, quarantined boolean"
)


def pattern_regex(pattern: str) -> "str | None":
    """Anchored Java-compatible regex for a robots path pattern, or
    None when the pattern is a plain prefix (the ``startswith`` fast
    path needs no regex). ``*`` → ``.*``; a trailing ``$`` becomes an
    end anchor; every other octet is matched literally."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    if "*" not in body and not anchored:
        return None
    parts = [re.escape(seg) for seg in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def parse_robots_txt(text: str, agent: str = "*") -> "list[tuple[str, str]]":
    """(rule_type, path_pattern) rows for the given agent of ONE
    robots.txt body. Pure function (driver- or worker-side).

    Two passes: first group every ``Allow``/``Disallow`` under the
    agents of its ``User-agent:`` header block (consecutive User-agent
    lines share a group; unknown directives neither close nor split a
    header — RFC 9309 says other records must not interfere with group
    parsing); then select the union of groups explicitly naming
    ``agent``, falling back to the ``*`` groups only when none does
    (§2.2.1). Empty values match nothing and are dropped. Malformed
    lines raise ValueError — ``robots_rules`` turns that into a
    per-host quarantine rather than a job failure."""
    groups = _parse_groups(text)
    wanted = agent.lower()
    named = [g["rules"] for g in groups if wanted in g["agents"]]
    if named:
        return [r for rules in named for r in rules]
    return [
        r
        for g in groups
        if "*" in g["agents"]
        for r in g["rules"]
    ]


def _parse_groups(text: str) -> "list[dict]":
    """Group-structured parse of ONE robots.txt body: [{agents, rules,
    crawl_delay}]. Shared by :func:`parse_robots_txt` (Allow/Disallow)
    and :func:`parse_crawl_delay` (the politeness rate directive —
    non-standard but near-universal in the wild, group-scoped by
    convention). Unknown records are ignored and never close a group
    header (RFC 9309 §2.2.4); malformed lines raise ValueError (the
    per-host quarantine trigger in robots_rules)."""
    groups: list[dict] = []
    current: dict = {"agents": [], "rules": [], "crawl_delay": None}
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
                groups.append(current)
                current = {"agents": [], "rules": [], "crawl_delay": None}
                in_group_header = True
            current["agents"].append(value.lower())
        elif key in ("allow", "disallow"):
            in_group_header = False
            if value:  # empty Disallow matches nothing (explicit allow-all)
                # reject patterns regex translation can't round-trip:
                # control octets would change meaning silently
                if any(ord(ch) < 0x20 for ch in value):
                    raise ValueError(f"control octet in robots pattern: {value!r}")
                current["rules"].append((key, value))
        elif key == "crawl-delay":
            # group-scoped politeness rate; a malformed number is a
            # malformed body (quarantine), not a silent default
            try:
                current["crawl_delay"] = float(value)
            except ValueError:
                raise ValueError(
                    f"malformed Crawl-delay value: {value!r}"
                ) from None
        # any other record type (Sitemap, …): ignored and MUST NOT
        # interfere with group parsing (RFC 9309 §2.2.4)
    groups.append(current)
    return groups


def parse_crawl_delay(text: str, agent: str = "*") -> "float | None":
    """The Crawl-delay (seconds) applying to ``agent`` for ONE
    robots.txt body, with the same group selection as
    :func:`parse_robots_txt` (explicitly-named groups win, else the
    ``*`` groups); None when no applicable group sets one. Multiple
    applicable groups: the strictest (largest) delay wins."""
    groups = _parse_groups(text)
    wanted = agent.lower()
    named = [g for g in groups if wanted in g["agents"]]
    pool = named if named else [g for g in groups if "*" in g["agents"]]
    delays = [g["crawl_delay"] for g in pool if g["crawl_delay"] is not None]
    return max(delays) if delays else None


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Explode per-host robots.txt bodies into the rule dim:
    (host, rule_type, path_prefix, pattern_re, quarantined,
    prefix_len). mapInPandas over the HOST dim (bounded),
    broadcastable downstream. ``pattern_re`` is non-null only for
    wildcard patterns (pre-translated anchored regex); ``prefix_len``
    is the raw pattern length — the RFC longest-match priority. A host
    whose body fails to parse is quarantined: ONE synthetic
    disallow-all row flagged ``quarantined = true`` (fail closed per
    host; the flag is a countable audit column, see ``robots_gate``)."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "host": [], "rule_type": [], "path_prefix": [],
                "pattern_re": [], "quarantined": [],
            }
            for host, text in zip(pdf["host"], pdf["__txt"]):
                try:
                    rules = parse_robots_txt(str(text), agent)
                except ValueError:
                    # fail closed for THIS host only: disallow-all
                    out["host"].append(host)
                    out["rule_type"].append("disallow")
                    out["path_prefix"].append("/")
                    out["pattern_re"].append(None)
                    out["quarantined"].append(True)
                    continue
                for rule_type, pat in rules:
                    out["host"].append(host)
                    out["rule_type"].append(rule_type)
                    out["path_prefix"].append(pat)
                    out["pattern_re"].append(pattern_regex(pat))
                    out["quarantined"].append(False)
            yield pd.DataFrame(out)

    return (
        robots.select(
            robots[host_col].alias("host"), robots[text_col].alias("__txt")
        )
        .mapInPandas(parse, schema=RULES_SCHEMA)
        .withColumn("prefix_len", F.length("path_prefix"))
    )


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Append ``allowed`` (boolean) and ``quarantined_host`` (boolean
    audit: the verdict involved a quarantined host's synthetic
    disallow-all) to a URL frame by RFC 9309 longest-match against the
    rule dim — MAP-ONLY over the corpus: the per-host rules collapse
    into one array row on the (tiny) dim side, that dim broadcasts,
    and the winner is picked per URL row with array expressions —
    ``filter`` keeps matching rules (``startswith`` for plain
    prefixes, ``regexp_like`` against the pre-translated regex for
    wildcard patterns), ``aggregate`` folds them to the max
    (pattern_len, is_allow) rule; the tie at equal pattern length
    prefers Allow per the RFC. Hosts without rules (join miss) and
    URLs matching no rule stay allowed. ZERO corpus shuffle — the r7
    version's per-URL max_by aggregate hash-partitioned the whole URL
    frame (with every carried column, e.g. page HTML in the composed
    crawl pipeline); the only shuffle left is the per-host collect on
    the rule dim (rows = rule count). Input rows pass through 1:1."""
    c = F.col(url_col)
    path = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    # RFC 9309 matches on path+query with an implied "/" path: a URL
    # with a query but empty path (http://host?x=1) extracts "?x=1",
    # which no "/"-anchored rule would ever match — prepend "/" whenever
    # the extraction does not already start with one (covers empty too).
    path = F.when(
        ~path.startswith("/"), F.concat(F.lit("/"), path)
    ).otherwise(path)
    host = F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(host, r":\d+$", "")
    rule_dim = rules.groupBy(F.col("host").alias("__host")).agg(
        F.collect_list(
            F.struct(
                F.col("prefix_len").alias("l"),
                # Allow outranks Disallow at equal length: second sort key
                (F.col("rule_type") == "allow").cast("int").alias("a"),
                F.col("rule_type").alias("t"),
                F.col("path_prefix").alias("p"),
                F.col("pattern_re").alias("re"),
                F.coalesce("quarantined", F.lit(False)).alias("q"),
            )
        ).alias("__rules")
    )
    keyed = urls.withColumn("__host", host).withColumn("__path", path)
    joined = keyed.join(F.broadcast(rule_dim), "__host", "left")

    hit = lambda r: F.coalesce(  # noqa: E731
        F.when(
            r["re"].isNotNull(), F.regexp_like(F.col("__path"), r["re"])
        ).otherwise(F.col("__path").startswith(r["p"])),
        F.lit(False),
    )
    matched = F.filter("__rules", hit)

    def _acc(l, a, t, q):
        return F.struct(
            l.alias("l"), a.alias("a"), t.alias("t"), q.alias("q")
        )

    zero = _acc(
        F.lit(-1), F.lit(-1), F.lit(None).cast("string"), F.lit(False)
    )
    win = F.aggregate(
        matched,
        zero,
        lambda acc, r: F.when(
            (r["l"] > acc["l"]) | ((r["l"] == acc["l"]) & (r["a"] > acc["a"])),
            _acc(r["l"], r["a"], r["t"], acc["q"] | r["q"]),
        ).otherwise(_acc(acc["l"], acc["a"], acc["t"], acc["q"] | r["q"])),
    )
    return (
        joined.withColumn("__w", win)
        .withColumn(
            "allowed",
            F.coalesce(F.col("__w.t") != "disallow", F.lit(True)),
        )
        .withColumn(
            "quarantined_host", F.coalesce(F.col("__w.q"), F.lit(False))
        )
        .drop("__w", "__rules", "__host", "__path")
    )


def robots_crawl_delays(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, crawl_delay) dim from per-host robots.txt bodies — the
    politeness-RATE companion to :func:`robots_rules` (same bounded
    mapInPandas over the HOST dim, same group selection via
    :func:`parse_crawl_delay`). Hosts that set no delay emit no row
    (callers coalesce a default); a host whose body fails to parse
    quarantines to a conservative 86400 s delay (fail closed: an
    unparseable host is fetched at most once a day, mirroring the
    disallow-all rule quarantine)."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "host": [], "crawl_delay": [], "quarantined": [],
            }
            for host, text in zip(pdf["host"], pdf["__txt"]):
                try:
                    delay = parse_crawl_delay(str(text), agent)
                except ValueError:
                    out["host"].append(host)
                    out["crawl_delay"].append(86400.0)
                    out["quarantined"].append(True)
                    continue
                if delay is not None:
                    out["host"].append(host)
                    out["crawl_delay"].append(float(delay))
                    out["quarantined"].append(False)
            yield pd.DataFrame(out)

    return robots.select(
        robots[host_col].alias("host"), robots[text_col].alias("__txt")
    ).mapInPandas(
        parse, schema="host string, crawl_delay double, quarantined boolean"
    )
