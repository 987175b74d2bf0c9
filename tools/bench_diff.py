#!/usr/bin/env python3
"""Mechanical per-query bench regression diff over BENCH_HISTORY.jsonl.

Usage:
  python3 tools/bench_diff.py                 # last two same-SF entries
  python3 tools/bench_diff.py -1 -3           # entry indices (negative ok)
  python3 tools/bench_diff.py --ramp          # last sf0.1 vs last sf1x (slope)

Prints per-query ratio (b/a) sorted worst-first, with totals. Entries
are the append-only per-run records Bench writes (one JSON per line,
each with a full per-query median map) — so any two runs of any rounds
can be compared without re-running anything.

Dev-only tooling — not part of the shipped Scala library.
"""
import json
import sys


def load():
    with open("BENCH_HISTORY.jsonl") as f:
        return [json.loads(l) for l in f if l.strip()]


def is_full(r):
    # Runs since r8 carry an explicit "only" tag (null on full runs);
    # older history entries fall back to the query-count heuristic.
    if "only" in r:
        return r["only"] is None
    return len(r.get("queries", {})) >= 20


def pick(rows, args):
    full = [r for r in rows if is_full(r)]
    if "--ramp" in args:
        a = [r for r in full if r.get("sf", "").endswith("sf0.1")][-1]
        b = [r for r in full if "sf1x" in r.get("sf", "")][-1]
        return a, b, "slope (sf1x / sf0.1)"
    idx = [int(x) for x in args if x.lstrip("-").isdigit()]
    if len(idx) == 2:
        return rows[idx[1]], rows[idx[0]], "ratio"
    # default: last two FULL-suite entries with the same sf (targeted
    # SPARK_GRAFT_BENCH_ONLY runs also land in the history; skip them)
    last = full[-1]
    prev = [r for r in full[:-1] if r.get("sf") == last.get("sf")]
    if not prev:
        sys.exit("no earlier entry with sf=%s" % last.get("sf"))
    return prev[-1], last, "ratio (latest / previous, same sf)"


def main():
    rows = load()
    a, b, label = pick(rows, sys.argv[1:])
    qa, qb = a.get("queries", {}), b.get("queries", {})
    common = sorted(set(qa) & set(qb))
    print("a: %s  %s  (%.1f s / %d queries)"
          % (a.get("ts", "?")[:19], a.get("sf"), a.get("value", 0), len(qa)))
    print("b: %s  %s  (%.1f s / %d queries)"
          % (b.get("ts", "?")[:19], b.get("sf"), b.get("value", 0), len(qb)))
    print("%s over %d common queries, worst first:" % (label, len(common)))
    ratios = sorted(((qb[k] / qa[k], k) for k in common if qa[k] > 0),
                    reverse=True)
    for r, k in ratios:
        mark = "  <-- check" if r > 3 and qb[k] > 2 else ""
        print("  %-30s %6.2fx  (%.2f -> %.2f)%s" % (k, r, qa[k], qb[k], mark))
    if not ratios:
        sys.exit("no common queries between the two entries")
    med = sorted(r for r, _ in ratios)[len(ratios) // 2]
    oa, ob = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    print("median %.2fx; only-in-a: %d%s; only-in-b: %d%s"
          % (med, len(oa), (" (%s...)" % ", ".join(oa[:3])) if oa else "",
             len(ob), (" (%s...)" % ", ".join(ob[:3])) if ob else ""))


if __name__ == "__main__":
    main()
