"""Summarize captured plans: Exchange count, join strategies, Python-eval
nodes, scans, sorts — the triage table guide §7.2 asks for.

Usage: python tools/plan_stats.py [tag]   (default: before)
"""

from __future__ import annotations

import glob
import os
import re
import sys


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09"
    )
    rows = []
    for path in sorted(glob.glob(os.path.join(root, f"*_{tag}.txt"))):
        key = os.path.basename(path)[: -len(f"_{tag}.txt")]
        text = open(path).read()
        n_ex = len(re.findall(r"\bExchange\b", text))
        n_bc = len(re.findall(r"BroadcastExchange", text))
        n_smj = len(re.findall(r"SortMergeJoin", text))
        n_bhj = len(re.findall(r"BroadcastHashJoin", text))
        n_shj = len(re.findall(r"ShuffledHashJoin", text))
        n_bnl = len(re.findall(r"BroadcastNestedLoop", text))
        n_cart = len(re.findall(r"CartesianProduct", text))
        n_py = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", text))
        n_sort = len(re.findall(r"\bSort \[", text))
        n_win = len(re.findall(r"\bWindow\b", text))
        n_scan = len(re.findall(r"Scan parquet|FileScan parquet", text))
        n_rdd = len(re.findall(r"Scan ExistingRDD|RDDScanExec", text))
        rows.append((key, n_ex - n_bc, n_bc, n_smj, n_shj, n_bhj, n_bnl + n_cart,
                     n_py, n_sort, n_win, n_scan, n_rdd))
    hdr = ("key", "shufEx", "bcEx", "SMJ", "SHJ", "BHJ", "NLJ", "Py", "Sort",
           "Win", "scans", "rdd")
    w = max(len(r[0]) for r in rows) if rows else 10
    print(f"{hdr[0]:<{w}} " + " ".join(f"{h:>6}" for h in hdr[1:]))
    for r in sorted(rows, key=lambda r: -r[1]):
        print(f"{r[0]:<{w}} " + " ".join(f"{v:>6}" for v in r[1:]))
    return 0


if __name__ == "__main__":
    main()
