"""Snapshot diff: classify row-level changes between two table versions.

The reference's warehouse reloads raw layers wholesale per Airflow run
(`dags/` re-land the Kaggle/API pulls every schedule tick); a production
lake wants the CHANGE set instead — which rows appeared, vanished, or
mutated between yesterday's snapshot and today's — both to feed
incremental downstream loads (merge/upsert) and to audit feed drift.
This is the batch CDC derivation: given two snapshots keyed the same
way, emit one row per key with an action in
{insert, delete, update, unchanged}.

Spark shape (100 TB): one full outer equi-join on the key — the single
unavoidable shuffle, AQE-skew-safe — with change detection on a 128-bit
md5 over the compared columns computed BEFORE the join, so wide payloads
never ride the shuffle twice and the comparison itself is one string
equality, not N per-column comparisons of possibly-nullable values.
Null-safe by construction: the digest folds NULL to a sentinel distinct
from any real value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _digest(cols: list[str]) -> F.Column:
    # Null-safe compare digest: coalesce each column's string form to a
    # sentinel no real value can collide with (0x1f unit-separator framing).
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x1fNULL\x1f")) for c in cols
    ]
    return F.md5(F.concat_ws("\x1f", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """One row per key present in either snapshot:
    (keys..., action, old_digest, new_digest).

    action: 'insert' (new only), 'delete' (old only), 'update' (both,
    digests differ), 'unchanged' (both, digests equal).
    """
    o = old.select(*keys, _digest(compare_cols).alias("old_digest"))
    n = new.select(*keys, _digest(compare_cols).alias("new_digest"))
    j = o.join(n, keys, "full_outer")
    action = (
        F.when(F.col("old_digest").isNull(), F.lit("insert"))
        .when(F.col("new_digest").isNull(), F.lit("delete"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    return j.select(*keys, action.alias("action"), "old_digest", "new_digest")


def diff_summary(diff: DataFrame) -> DataFrame:
    """Per-action row counts — the audit line a load job logs per run."""
    return diff.groupBy("action").agg(F.count(F.lit(1)).alias("n_rows"))


def apply_changeset(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """MERGE: apply a row-level changeset to a snapshot — delete keys
    removed, update rows replaced, insert rows appended.  The consuming
    half of ``snapshot_diff``: together they give the incremental-load
    round trip (apply(old, diff(old, new)) == new, by test and by the
    registered oracle) the reference's wholesale per-DAG-run reloads
    never had.

    ``changes`` carries ``keys`` + an ``action`` column in
    {insert, update, delete} + ``payload_cols`` (ignored for deletes).
    Rows labeled 'unchanged' are tolerated and ignored, so a raw
    ``snapshot_diff`` output joined to payloads can be passed directly.

    Scale shape (100 TB): ONE left-anti equi-join on the key is the only
    snapshot-sized operation — AQE broadcasts it when the changeset is
    small (the normal case: changes are a sliver of the table), and the
    upsert rows ride in shuffle-free via union.  No window, no global
    sort, no full-table rewrite logic in the plan.
    """
    touched = changes.where(F.col("action") != "unchanged").select(*keys)
    upserts = changes.where(F.col("action").isin("insert", "update")).select(
        *keys, *payload_cols
    )
    kept = snapshot.join(touched, keys, "left_anti").select(*keys, *payload_cols)
    return kept.unionByName(upserts)
