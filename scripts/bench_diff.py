#!/usr/bin/env python3
"""Per-query diff of two bench artifacts — the round-over-round
like-for-like comparison the judge needs to adjudicate a total-time
delta (round-13 VERDICT item #5: the driver's BENCH_r{N}.json truncates
to a 2000-char tail, so per-query history must come from committed
BENCH_LOCAL_r{N}.json artifacts, not the builder's /tmp files).

  python3 scripts/bench_diff.py OLD.json NEW.json [topk]

Both inputs are graft.Bench stdout JSON lines (or a file whose last
line is one): {"queries": {name: t1, ...}, "queries_t2": {...}, ...}.
Each query compares min(t1, t2>0) old vs new; sub-0.3s-both rows are
skipped (timer jitter). Prints the top-K regressions, top-K
improvements, added/removed queries, and the shared-query totals.
"""
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read().strip()
    # accept a whole-file JSON object or a log whose LAST line is the JSON
    for candidate in ([txt] + txt.splitlines()[-1:]):
        try:
            doc = json.loads(candidate)
            if isinstance(doc, dict):
                return doc
        except json.JSONDecodeError:
            continue
    sys.stderr.write(f"bench_diff: {path} holds no bench JSON\n")
    sys.exit(2)


def tmin(doc: dict, name: str) -> float:
    t1 = doc.get("queries", {}).get(name, -1.0)
    t2 = doc.get("queries_t2", {}).get(name, -1.0)
    ts = [t for t in (t1, t2) if t is not None and t > 0]
    return min(ts) if ts else -1.0


def main() -> None:
    if len(sys.argv) not in (3, 4):
        print(__doc__)
        sys.exit(2)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    topk = int(sys.argv[3]) if len(sys.argv) == 4 else 10
    oq = set(old.get("queries", {}))
    nq = set(new.get("queries", {}))
    shared = sorted(oq & nq)
    rows, errored = [], []
    for name in shared:
        a, b = tmin(old, name), tmin(new, name)
        if a <= 0 or b <= 0:
            errored.append((name, a, b))  # the worst regression class
            continue
        if a < 0.3 and b < 0.3:
            continue  # both under the floor clamp: timer jitter
        rows.append((name, a, b, b / a))
    rows.sort(key=lambda r: -r[3])

    def table(title, sel):
        if not sel:
            return
        print(f"\n{title}")
        for name, a, b, r in sel:
            print(f"  {name:32s} {a:8.2f}s -> {b:8.2f}s  ({r:5.2f}x)")

    table(f"top {topk} regressions (new/old)",
          [r for r in rows[:topk] if r[3] > 1.0])
    table(f"top {topk} improvements",
          [r for r in sorted(rows, key=lambda r: r[3])[:topk] if r[3] < 1.0])
    if errored:
        print(f"\nERRORED in one run ({len(errored)}):")
        for name, a, b in errored:
            side = "new" if b <= 0 else "old"
            print(f"  {name:32s} old={a:.2f}s new={b:.2f}s  (errored in {side})")
    added, removed = sorted(nq - oq), sorted(oq - nq)
    if added:
        print(f"\nadded ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"\nREMOVED ({len(removed)}): {', '.join(removed)}")
    tot_a = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    if tot_a > 0:
        print(f"\nshared-query total (>=0.3s rows): {tot_a:.1f}s -> "
              f"{tot_b:.1f}s ({tot_b / tot_a:.2f}x) over {len(rows)} queries")


if __name__ == "__main__":
    main()
