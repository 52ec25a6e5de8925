#!/usr/bin/env python
"""Local replica of the driver's correctness gate: for each SparkEntry query,
load the parquet dumped by graft.Verify and compare against the DuckDB oracle
(columns sorted by name, values compared in row order).

Decimal values are compared by their CANONICAL STRING (like the driver's
hash), not Python Decimal equality — Decimal("253942.00") == Decimal("253942.0")
is True in Python but the two hash differently driver-side. Any Decimal
reaching this boundary is flagged: the portability rules (OracleSqlGen.scala)
say decimal aggregates must be cast to DOUBLE on both sides before output."""
import json, sys, math
from decimal import Decimal
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fail += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fail += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        fail += 1
        continue
    mism = None
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        if any(isinstance(v, Decimal) for v in a[:5] + b[:5]):
            print(f"WARN {name}: column {c} is DECIMAL at the compare "
                  f"boundary — cast to DOUBLE on both sides (portability rule)")
        for i, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, Decimal) or isinstance(y, Decimal):
                # driver hashes the canonical string; scale matters
                same = str(x) == str(y)
            else:
                same = (x == y) or (x is None and y is None)
                try:
                    if isinstance(x, float) and isinstance(y, float):
                        same = (math.isnan(x) and math.isnan(y)) or x == y
                except Exception:
                    pass
            if not same and str(x) != str(y):
                mism = (c, i, x, y)
                break
        if mism:
            break
    if mism:
        c, i, x, y = mism
        print(f"FAIL {name}: col={c} row={i}: got={x!r} want={y!r}")
        fail += 1
    else:
        print(f"ok   {name} ({len(got)} rows)")
        ok += 1
import os
bands_path = f"{out_dir}/band_checks.json"
if os.path.exists(bands_path):
    bands = json.load(open(bands_path))
    for name, b in sorted(bands.items()):
        if b["band_ok"]:
            print(f"band ok   {name}: {b['detail']}")
            ok += 1
        else:
            print(f"band FAIL {name}: {b['detail']}")
            fail += 1
print(f"== {ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
