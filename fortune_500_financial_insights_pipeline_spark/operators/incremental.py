"""Incremental aggregate maintenance: mergeable partial states.

The materialized-view refresh pattern every warehouse (and every streaming
sink) relies on: aggregate each arriving batch into a small per-key STATE
relation, and fold states together instead of re-scanning history. Correct
iff every aggregate is algebraic — expressible as a finalize() over
merge()-able partials (Gray et al., "Data Cube", ICDE 1996). count/sum/
min/max merge trivially; avg is finalized from (sum, count); the sum runs
in fixed point (same discipline as functions/deterministic.dsum) so the
merged total is bit-identical to a direct pass regardless of how history
was batched.

At 100 TB this is the difference between an O(delta) nightly refresh and an
O(history) one. The state relation is keyed by the group-by columns; the
merge is a groupBy over (states ∪ delta-state) — partial aggregation on the
tiny state rows, never the raw history.

Reference parity: the reference's warehouse rebuilds staging tables from
raw on every DAG run (`dags/transform_data.py`); this operator is the
incremental form of the same staging aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def grouped_state(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Per-key mergeable aggregate state over one batch:
    (keys..., cnt, sum_fp, vmin, vmax). ``sum_fp`` is the exact fixed-point
    (1e6) long sum of ``value_col``."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.round(v * _SCALE).cast("long")).alias("sum_fp"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold any number of state relations into one: union + re-aggregate.
    Associative and commutative — batch boundaries can't leak into the
    result. The union's inputs are already per-key states, so the merge
    shuffles state rows (|keys| cardinality), not history."""
    if not states:
        raise ValueError("states must be non-empty")
    it = iter(states)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_fp").alias("sum_fp"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def finalize_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """State → user-facing aggregate row: count, exact sum, min, max, avg."""
    total = F.col("sum_fp").cast("double") / _SCALE
    return state.select(
        *keys,
        F.col("cnt").alias("n_rows"),
        F.round(total, 2).alias("sum_value"),
        F.col("vmin").alias("min_value"),
        F.col("vmax").alias("max_value"),
        F.round(total / F.col("cnt"), 6).alias("avg_value"),
    )


def delta_agg_refresh(
    old_agg: DataFrame,
    old_rows: DataFrame,
    new_rows: DataFrame,
    keys: list[str],
    group_col: str,
    count_alias: str = "n",
    sum_col: str | None = None,
    sum_alias: str = "s",
) -> DataFrame:
    """Refresh a grouped (count, sum) aggregate from a CDC changeset
    WITHOUT rescanning the table: every touched key contributes its
    new-side values with weight +1 and its old-side values with weight
    −1 (inserts have no old side, deletes no new side, updates both — a
    group-moving update naturally subtracts from the old group and adds
    to the new one), and the deltas fold into the previous aggregate by
    one state-sized groupBy.  Groups whose refreshed count reaches zero
    vanish, exactly as a recompute would drop them.

    ``merge_states``/``grouped_state`` (above) maintain aggregates from
    append-only batches; this is the UPDATE/DELETE-capable form a CDC
    feed needs (``operators/cdc.snapshot_diff`` derives the changeset;
    the refresh law — delta refresh == direct aggregate over the new
    snapshot — is what the registered oracle asserts).

    Scale shape: the only row-level work is the diff key anti/semi joins
    on ``keys`` (changeset-sized probes of the two snapshots); the fold
    itself runs on (old aggregate ∪ delta rows) — state-sized, never
    history-sized.
    """
    from fortune_500_financial_insights_pipeline_spark.operators.cdc import snapshot_diff

    compare = [group_col] + ([sum_col] if sum_col else [])
    diff = snapshot_diff(old_rows, new_rows, keys, compare)
    touched = diff.where(F.col("action") != "unchanged").select(*keys)
    s_new = F.col(sum_col).cast("long") if sum_col else F.lit(0).cast("long")
    plus = (
        new_rows.join(touched, keys, "left_semi")
        .select(F.col(group_col), F.lit(1).cast("long").alias("__dn"), s_new.alias("__ds"))
    )
    minus = (
        old_rows.join(touched, keys, "left_semi")
        .select(
            F.col(group_col),
            F.lit(-1).cast("long").alias("__dn"),
            (-s_new).alias("__ds"),
        )
    )
    state = old_agg.select(
        F.col(group_col),
        F.col(count_alias).cast("long").alias("__dn"),
        F.col(sum_alias).cast("long").alias("__ds")
        if sum_col
        else F.lit(0).cast("long").alias("__ds"),
    )
    refreshed = (
        state.unionByName(plus)
        .unionByName(minus)
        .groupBy(group_col)
        .agg(F.sum("__dn").alias(count_alias), F.sum("__ds").alias(sum_alias))
        .where(F.col(count_alias) > 0)
    )
    if not sum_col:
        refreshed = refreshed.drop(sum_alias)
    return refreshed
