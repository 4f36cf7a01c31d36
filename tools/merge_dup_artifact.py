#!/usr/bin/env python3
"""Stitch the d20 CertifyDup result into a strict-drive results file
(dev-only). The dup_k10 artifact then carries every dedup-family row:
the 8 directly-replayed queries from drive_oracle.py plus d20 with an
explicit method field recording that its certificate is the Spark-side
d22 expansion equality (the 12.5M-pair DuckDB replay is infeasible on
that corpus — the r11 attempt died with no output).
Usage: merge_dup_artifact.py <drive_results> <certify_json> <out>"""
import json, sys

drive, certify, out = sys.argv[1:4]
res = json.load(open(drive))
c = json.load(open(certify))
res[c["query"]] = {
    "status": c["status"],
    "sec": c["sec"],
    "method": c["method"],
    "detail": (
        f"pair rows {c['n_pair_rows']}, expanded {c['n_expanded']}, "
        f"n_pairs sum {c['n_pairs_sum']}, "
        f"exceptAll diffs {c['expanded_minus_full']}/"
        f"{c['full_minus_expanded']}; grouped form (d22) strict-passes "
        "DuckDB on the same shards, so d20 = expand(d22) is certified "
        "without materializing the quadratic pair set in one process"),
}
json.dump(res, open(out, "w"), indent=1, sort_keys=True)
npass = sum(1 for v in res.values() if v["status"] == "pass")
print(f"{out}: {npass} pass of {len(res)}")
