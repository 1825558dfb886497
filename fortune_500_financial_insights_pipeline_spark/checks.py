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
