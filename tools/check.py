#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate:
run graft.Verify (Spark) at a given SF, then execute each oracle SQL in
DuckDB over the same parquet tables and compare (schema-insensitive:
columns sorted by name, rows sorted, values hashed with rounding-free
equality). Not part of the library."""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")
RUN_SPARK = "--no-spark" not in sys.argv
# --strict: compare floats at FULL precision (repr) instead of .10g —
# catches sub-10-digit engine divergence (e.g. a 1-ulp terminal
# division) that the default normalization hides.
STRICT = "--strict" in sys.argv
ONLY = None  # --only=q45_merge_upsert,q46_x : restrict spark run + compare
for a in sys.argv:
    if a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))

if RUN_SPARK:
    sel = f' {",".join(sorted(ONLY))}' if ONLY else ''
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF_DIR} {OUT}{sel}'],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "8"})
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-3000:])
        sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # driver testdata is one file per table; ScaleGen writes Spark-style
    # directories of part files — glob those
    p = f"{SF_DIR}/{t}.parquet"
    if Path(p).is_dir():
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.loads((OUT / "oracle_sql.json").read_text())

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v) if STRICT else f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

n_pass = n_fail = 0
results = sorted(p for p in OUT.iterdir() if p.is_dir())
names = {p.name for p in results}
for name in sorted((set(oracle) | names) if ONLY is None else ONLY):
    if name not in names:
        print(f"FAIL {name}: no spark result written")
        n_fail += 1
        continue
    files = list((OUT / name).glob("*.parquet"))
    tbl = pq.read_table(files[0]) if files else None
    if name not in oracle:
        ok = tbl is not None and tbl.num_rows > 0
        print(f"{'ok  ' if ok else 'FAIL'} {name}: rows-only ({tbl.num_rows if tbl else 0})")
        n_pass += ok; n_fail += not ok
        continue
    try:
        rel = con.sql(oracle[name])
        ocols = list(rel.columns)
        # Boundary guard (the round-6 lesson): HUGEINT/DECIMAL/FLOAT at
        # an oracle's OUTPUT position round-trips differently through
        # downstream fetch paths than through fetchall — the 11
        # round-6 driver failures were exactly the queries with an
        # uncast SUM(bigint) (→ HUGEINT) at output. Only plain types
        # may cross the compare boundary.
        bad = [f"{c}:{t}" for c, t in zip(ocols, rel.types)
               if str(t) in ("HUGEINT", "UHUGEINT", "FLOAT")
               or str(t).startswith("DECIMAL")]
        if bad:
            print(f"FAIL {name}: non-boundary oracle output types {bad}")
            n_fail += 1
            continue
        orows = rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        n_fail += 1
        continue
    scols = tbl.column_names
    srows = [tuple(c[i].as_py() for c in tbl.columns) for i in range(tbl.num_rows)]
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    if sc != oc:
        print(f"FAIL {name}: cols spark={sc} oracle={oc}")
        n_fail += 1
    elif sr != orr:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(sr + [None] * len(orr), orr + [None] * len(sr))) if a != b)
        print(f"FAIL {name}: rows {len(sr)} vs {len(orr)}; first diff @{diff[0]}:\n  spark  {diff[1]}\n  oracle {diff[2]}")
        n_fail += 1
    else:
        print(f"ok   {name}: {len(sr)} rows")
        n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
