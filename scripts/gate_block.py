#!/usr/bin/env python3
"""Emit the STATUS.md gate block with counts DERIVED from artifacts —
never hand-type gate numbers again (the recurring off-by-one class:
round-11 VERDICT #3, round-12 VERDICT #3).

Two sources, matching the two stages a round has them at:

  python3 scripts/gate_block.py verify <sf_dir> <out_dir>
      Re-runs scripts/local_verify.py on an existing graft.Verify dump
      and derives the counts from its per-query lines (hash-ok vs
      band-ok vs fail).

  python3 scripts/gate_block.py correctness CORRECTNESS_rN.json
      Derives the same counts from the driver's artifact: hash_match
      true => hash-ok, err == "no_oracle" => banded-by-contract,
      anything else => fail/err.

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


def from_correctness(path: str) -> tuple[int, int, int]:
    data = json.load(open(path))
    rows = data.get("queries", data)  # driver wraps or doesn't
    if not rows:
        sys.stderr.write(f"gate_block: {path} holds no query rows.\n")
        sys.exit(2)
    hash_ok = band_ok = fail = 0
    for _, r in sorted(rows.items()):
        if r.get("err") == "no_oracle":
            # the driver artifact records only "no oracle declared", not
            # the in-engine band verdicts — those live in the Verify
            # dump's band_checks.json (use the `verify` mode to check
            # them); flagged in the output so the blindness is explicit
            band_ok += 1
        elif r.get("hash_match") and r.get("rows_match") and r.get("schema_match"):
            hash_ok += 1
        else:
            fail += 1
    return hash_ok, band_ok, fail


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "verify" and len(sys.argv) == 4:
        hash_ok, band_ok, fail = from_verify(sys.argv[2], sys.argv[3])
        source = f"local_verify.py over {sys.argv[3]} ({sys.argv[2]})"
    elif mode == "correctness" and len(sys.argv) == 3:
        hash_ok, band_ok, fail = from_correctness(sys.argv[2])
        source = sys.argv[2]
    else:
        print(__doc__)
        sys.exit(2)
    total = hash_ok + band_ok + fail
    today = datetime.date.today().isoformat()
    print(f"- Correctness: **{total} declared queries — {hash_ok} "
          f"DuckDB-oracle hash-matched + {band_ok} band-checked by the "
          f"declared contract, {fail} fail** "
          f"(derived by scripts/gate_block.py from {source}, {today}).")
    if mode == "correctness" and band_ok:
        print(f"  (the driver artifact does not record in-engine band "
          f"verdicts for the {band_ok} banded rows — `verify` mode reads "
          f"band_checks.json and does)")
    if fail:
        print(f"  !! {fail} FAILURES — do not ship this block; fix them.")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
