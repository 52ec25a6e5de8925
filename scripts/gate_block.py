#!/usr/bin/env python3
"""Emit the STATUS.md gate block with counts DERIVED from artifacts —
never hand-type gate numbers again (the recurring off-by-one class:
round-11 VERDICT #3, round-12 VERDICT #3).

Two sources, matching the two stages a round has them at:

  python3 scripts/gate_block.py verify <sf_dir> <out_dir>
      Re-runs scripts/local_verify.py on an existing graft.Verify dump
      and derives the counts from its per-query lines (hash-ok vs
      band-ok vs fail).

  python3 scripts/gate_block.py correctness CORRECTNESS_rN.json [band_checks.json]
      Derives the same counts from the driver's artifact: hash_match
      true => hash-ok, anything failing => fail/err. err == "no_oracle"
      rows are counted as band-checked ONLY when a band_checks.json is
      passed and carries a green band_ok verdict for that query;
      without one they are reported as "no oracle declared" (the driver
      artifact records no in-engine band verdicts, so claiming
      band-checked from it alone would be evidence-free).

Paste the printed block into STATUS.md verbatim.
"""
import datetime
import json
import re
import subprocess
import sys


def from_verify(sf_dir: str, out_dir: str) -> tuple[int, int, int]:
    proc = subprocess.run(
        [sys.executable, "scripts/local_verify.py", sf_dir, out_dir],
        capture_output=True, text=True)
    # one query = one row, the driver's counting: a query with BOTH an
    # oracle row and an in-engine band check (e.g. q_approx_topk) counts
    # once, as hash-verified
    hash_ok, band_ok, fail = set(), set(), set()
    for line in proc.stdout.splitlines():
        m = re.match(r"(ok|band ok|FAIL|band FAIL)\s+(\S+?):?\s", line + " ")
        if not m:
            continue
        kind, name = m.group(1), m.group(2).rstrip(":")
        {"ok": hash_ok, "band ok": band_ok,
         "FAIL": fail, "band FAIL": fail}[kind].add(name)
    if not (hash_ok or band_ok or fail):
        # a broken verify run (bad path, missing oracle_sql.json, duckdb
        # crash) must never yield a pasteable "0 declared, 0 fail" block
        sys.stderr.write(
            "gate_block: local_verify.py produced no per-query lines "
            f"(rc={proc.returncode}) — nothing to derive a gate from.\n"
            + proc.stderr[-2000:])
        sys.exit(2)
    band_only = band_ok - hash_ok - fail
    return len(hash_ok - fail), len(band_only), len(fail)


def from_correctness(path: str,
                     band_path: str | None = None) -> tuple[int, int, int, int]:
    data = json.load(open(path))
    rows = data.get("queries", data) if isinstance(data, dict) else data
    # a list-shaped queries array (rows carrying their own name field)
    # must normalize, not crash on .items()
    if isinstance(rows, list):
        rows = {r.get("name", r.get("query", f"row{i}")): r
                for i, r in enumerate(rows)}
    if not rows:
        sys.stderr.write(f"gate_block: {path} holds no query rows.\n")
        sys.exit(2)
    band_green: set[str] | None = None
    if band_path:
        bands = json.load(open(band_path))
        if isinstance(bands, list):
            bands = {b.get("query", b.get("name", f"band{i}")): b
                     for i, b in enumerate(bands)}
        band_green = {k for k, v in bands.items()
                      if isinstance(v, dict) and v.get("band_ok")}
    hash_ok = band_ok = no_oracle = fail = 0
    for name, r in sorted(rows.items()):
        if r.get("err") == "no_oracle":
            # count as band-checked only with EVIDENCE a band check ran
            # green (band_checks.json); otherwise report the row honestly
            # as "no oracle declared"
            if band_green is None:
                no_oracle += 1
            elif name in band_green:
                band_ok += 1
            else:
                fail += 1
        elif r.get("hash_match") and r.get("rows_match") and r.get("schema_match"):
            hash_ok += 1
        else:
            fail += 1
    return hash_ok, band_ok, no_oracle, fail


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    no_oracle = 0
    if mode == "verify" and len(sys.argv) == 4:
        hash_ok, band_ok, fail = from_verify(sys.argv[2], sys.argv[3])
        source = f"local_verify.py over {sys.argv[3]} ({sys.argv[2]})"
    elif mode == "correctness" and len(sys.argv) in (3, 4):
        band_path = sys.argv[3] if len(sys.argv) == 4 else None
        hash_ok, band_ok, no_oracle, fail = from_correctness(
            sys.argv[2], band_path)
        source = sys.argv[2] + (f" + {band_path}" if band_path else "")
    else:
        print(__doc__)
        sys.exit(2)
    total = hash_ok + band_ok + no_oracle + fail
    today = datetime.date.today().isoformat()
    banded = f" + {band_ok} band-checked" if band_ok else ""
    unchecked = (f" + {no_oracle} no-oracle-declared (band verdicts NOT "
                 f"in this artifact)" if no_oracle else "")
    print(f"- Correctness: **{total} declared queries — {hash_ok} "
          f"DuckDB-oracle hash-matched{banded}{unchecked}, {fail} fail** "
          f"(derived by scripts/gate_block.py from {source}, {today}).")
    if no_oracle:
        print(f"  (pass the matching band_checks.json — or use `verify` "
          f"mode — to cross-check the {no_oracle} banded rows instead of "
          f"taking them on faith)")
    if fail:
        print(f"  !! {fail} FAILURES — do not ship this block; fix them.")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
