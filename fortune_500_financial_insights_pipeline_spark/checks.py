"""Data-quality checks: the declarative constraints the reference's DDLs
state but nothing enforces (UNIQUE (Ticker, Date) code/sql/DDLs:14, NOT
NULL :4, FK-less key structure) — evaluated as single-pass aggregates.

Each check returns a violation COUNT (0 = pass) computed in one aggregate
over the frame — no collect of offending rows unless you ask (``sample``),
so a check over 100 TB costs one scan. ``run_checks`` batches several
checks into ONE job by unioning their aggregates."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    name: str
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def not_null(*cols: str) -> tuple[str, Column]:
    cond = None
    for c in cols:
        e = F.col(c).isNull()
        cond = e if cond is None else (cond | e)
    return (f"not_null({','.join(cols)})", F.sum(cond.cast("long")))


def unique_key(*cols: str) -> tuple[str, Column]:
    """Duplicate-key count: rows beyond the first per key. Exact distinct
    via two stacked aggregations would need a second pass; count - distinct
    does it inside the same aggregate."""
    return (
        f"unique({','.join(cols)})",
        F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]),
    )


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    bad = ~F.col(col).between(lo, hi) & F.col(col).isNotNull()
    return (f"in_range({col},[{lo},{hi}])", F.sum(bad.cast("long")))


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    bad = ~F.col(col).isin(values) & F.col(col).isNotNull()
    return (f"accepted_values({col})", F.sum(bad.cast("long")))


def run_checks(df: DataFrame, *checks: tuple[str, Column]) -> list[CheckResult]:
    """Evaluate every check in ONE aggregation job over one scan."""
    row = df.agg(*[expr.alias(f"c{i}") for i, (_, expr) in enumerate(checks)]).head()
    return [
        CheckResult(name, int(row[f"c{i}"] or 0))
        for i, (name, _) in enumerate(checks)
    ]


def referential(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> CheckResult:
    """Orphan count: child keys with no parent (left-anti — the one check
    that inherently needs a join, kept separate from the single-pass batch)."""
    n = (
        child.select(F.col(child_key))
        .filter(F.col(child_key).isNotNull())
        .join(parent.select(F.col(parent_key)), child[child_key] == parent[parent_key], "left_anti")
        .count()
    )
    return CheckResult(f"referential({child_key}->{parent_key})", n)


def observed(df: DataFrame, name: str, *metrics: Column):
    """Attach an Observation collecting ``metrics`` during the next action —
    pipeline telemetry for free (no second scan, no collect): the metrics
    ride the job that materializes the frame.

    Returns (df, observation); read ``observation.get`` AFTER an action.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs


# --- DataFrame-returning audit form -----------------------------------------
# run_checks/referential above collect a driver-side verdict; the functions
# below keep the SAME rules as a (rule, n_violations) DataFrame — no collect,
# so the summary can be written, joined, or gated on downstream, and the
# whole audit is oracle-checkable (q_dq_audit).


def row_rule_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Count violations for row-local rules in ONE aggregation pass.

    ``rules`` maps rule name → boolean Column that is true when the row
    VIOLATES the rule (nulls in the predicate count as non-violations —
    write an explicit ``isNull()`` rule for null checks).
    """
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    return wide.unpivot([], list(rules), "rule", "n_violations")


def unique_violations(df: DataFrame, keys: list[str], rule: str) -> DataFrame:
    """Rows beyond the first per key group (0 when the key is unique)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.sum(F.col("_n") - 1).cast("long").alias("n_violations"))
        .select(F.lit(rule).alias("rule"), "n_violations")
    )


def ref_violations(
    df: DataFrame, key: str, dim: DataFrame, dim_key: str, rule: str
) -> DataFrame:
    """Fact rows whose key has no match in the dimension (orphans)."""
    orphans = df.join(dim, df[key] == dim[dim_key], "left_anti")
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations")).select(
        F.lit(rule).alias("rule"), "n_violations"
    )


def audit(parts: list[DataFrame]) -> DataFrame:
    """Union the per-rule summaries into one (rule, n_violations) frame."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Deequ-style dataset profile: one row per column with
    (col_name, n_rows, n_nonnull, n_distinct, null_frac, min_s, max_s) —
    the stats sheet a curation pipeline records per snapshot before
    gating a load (completeness regressions, key-cardinality drift,
    domain-bound violations all fall out of this one frame diffed
    against yesterday's).

    Scale shape: ONE aggregate pass over the table computes every metric
    (Catalyst plans the multi COUNT DISTINCT via Expand — one shuffle);
    the per-column rows come from a ``stack`` unpivot of that single
    1-row result, so profiling k columns of a 100 TB table costs one
    scan, never k.  min/max are cast to string AFTER aggregating so one
    output schema fits every column type; ``null_frac`` is one
    deterministic double division of exact longs.
    """
    aggs = [F.count(F.lit(1)).alias("__nr")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = [
        x
        for c in cols
        for x in (
            F.lit(c),
            F.col(f"__nn_{c}"),
            F.col(f"__nd_{c}"),
            (F.col("__nr") - F.col(f"__nn_{c}")).cast("double") / F.col("__nr"),
            F.col(f"__mn_{c}"),
            F.col(f"__mx_{c}"),
        )
    ]
    return (
        row.select(
            F.col("__nr").alias("n_rows"),
            F.stack(F.lit(len(cols)), *stacked),
        )
        .toDF("n_rows", "col_name", "n_nonnull", "n_distinct", "null_frac", "min_s", "max_s")
        .select("col_name", "n_rows", "n_nonnull", "n_distinct", "null_frac", "min_s", "max_s")
    )


# First-digit shares under Benford's law, computed ONCE in Python so the
# Spark plan and the DuckDB oracle embed the identical double literals —
# no cross-engine libm log10 ever enters a query.
BENFORD_EXPECTED: dict[int, float] = {
    d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def benford_digit_audit(df: DataFrame, amount_col: str) -> DataFrame:
    """First-significant-digit distribution of a positive amount column
    vs Benford's law — the classic screening audit for fabricated or
    mis-scaled financial feeds (naturally-occurring prices follow
    log-uniform first digits; synthetic or truncated feeds don't).
    One row per digit 1-9: (digit, n, obs_share, exp_share, dev).

    The amount must be pre-scaled to a positive integer (cents): the
    first significant digit is then just the first character of its
    decimal form (scaling by powers of ten never changes it).  One
    groupBy(digit) aggregate + a broadcast 1-row total; shares and
    deviations are fixed-order double expressions over exact longs, so
    the audit hash-matches cross-engine.  No chi² scalar is emitted on
    purpose — summing 9 doubles has engine-ordered rounding; the
    per-digit rows are the deterministic deliverable and a caller can
    fold them any way it likes.
    """
    pos = df.where(F.col(amount_col) > 0)
    digit = F.substring(F.col(amount_col).cast("string"), 1, 1).cast("int")
    counts = pos.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("__tot"))
    exp_share = F.element_at(
        F.array(*[F.lit(BENFORD_EXPECTED[d]) for d in range(1, 10)]),
        F.col("digit"),
    )
    obs = F.col("n").cast("double") / F.col("__tot")
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        obs.alias("obs_share"),
        exp_share.alias("exp_share"),
        (obs - exp_share).alias("dev"),
    )


def fd_audit(df, fds):
    """Functional-dependency audit: for each candidate FD X → Y, count
    determinant keys and keys where Y is NOT unique — the
    schema-discovery profiling step (Deequ/metanome-style) that
    validates assumed keys and uncovers denormalization damage before a
    MERGE or dim build trusts them.

    ``fds`` is a list of (name, det_col, dep_col). One hash aggregate
    per FD over (det, dep) distinct pairs — shuffles bounded by key
    cardinality; results union into one tiny report frame."""
    from pyspark.sql import functions as F

    reports = []
    for name, det, dep in fds:
        per_key = (
            df.select(F.col(det).alias("__k"), F.col(dep).alias("__v"))
            .groupBy("__k")
            .agg(F.countDistinct("__v").alias("__nv"))
        )
        rep = per_key.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("__nv") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_keys"),
            (F.max("__nv") <= 1).alias("holds"),
        )
        reports.append(rep)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def table_checksum(df, cols=None):
    """Order-independent table checksum: one row (n_rows, checksum) where
    checksum = Σ over rows of a 64-bit row digest (xxhash64 of the
    canonicalized column values), summed as longs with wraparound. The
    migration-validation primitive: two tables agree iff (n, checksum)
    agree (up to digest collisions), at the cost of ONE scan each, no
    sort, no shuffle beyond a scalar aggregate — the cheap gate a
    copy-job runs before anyone pays for a full snapshot diff
    (operators/cdc.snapshot_diff finds WHAT differs; this says WHETHER).
    Partition- and order-invariant because addition commutes.

    NULLs are canonicalized to a sentinel BEFORE hashing: xxhash64 skips
    NULL inputs entirely, so without the coalesce, rows differing only in
    WHICH nullable column holds a value — ('a', NULL) vs (NULL, 'a') —
    would collide systematically. The per-column position is part of the
    digest because argument order is."""
    from pyspark.sql import functions as F

    use = cols if cols is not None else df.columns
    digest = F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in use]
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(digest).alias("checksum"),
    )


def table_checksum_md5(df, cols, bucket, n_buckets=16):
    """Cross-engine-PORTABLE order-independent checksum — the digest the
    oracle-verified q_table_checksum runs (``table_checksum`` above is the
    cheaper JVM-only xxhash64 form; xxhash64's seed/variant is
    engine-specific, md5 is bit-stable everywhere).

    Per bucket: (n_rows, Σ 40-bit md5-derived digest) — 40 bits keeps the
    per-bucket long sum overflow-free to ~8M rows/bucket (widen
    ``n_buckets`` for bigger tables; per-bucket rows also LOCALIZE a
    mismatch to 1/n of the key space).

    Each value is LENGTH-FRAMED before joining — ``len:value`` with NULL
    as the bare token ``n`` — so the pre-hash string parses back to
    exactly one column tuple: a separator occurring INSIDE a value
    (('a|b','c') vs ('a','b|c')) cannot realign columns, a genuine string
    equal to a null sentinel cannot impersonate NULL, and rows differing
    only in which nullable column holds a value cannot collide
    (concat_ws would silently skip nulls otherwise). This is the r4
    advisor hardening on top of r3's null canonicalization; the oracle
    mirrors the framing byte for byte.

    ``bucket``: integer Column assigning rows to buckets (e.g. a key
    modulo ``n_buckets``)."""
    from pyspark.sql import functions as F

    def _framed(c):
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("n")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s)
        )

    safe = [_framed(c) for c in cols]
    digest = F.conv(
        F.substring(F.md5(F.concat_ws("|", *safe)), 1, 10), 16, 10
    ).cast("long")
    return (
        df.select(digest.alias("__d"), (bucket % n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__d").cast("long").alias("checksum"),
        )
        .orderBy("bucket")
    )
