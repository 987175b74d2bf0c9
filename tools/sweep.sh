#!/usr/bin/env bash
# Dual-SF dtype-strict oracle pre-flight (VERDICT r3 #8): runs the full
# Verify dump + DuckDB oracle compare at BOTH sf0.01 and sf0.1, so no
# oracle can depend on an SF-specific rounding accident and every new
# query goes through the same gate the driver applies.
#
# Usage: tools/sweep.sh [sf...]      (default: sf0.01 sf0.1)
# Dev-only tooling — not part of the shipped Scala library.
#
# NOTE (r8/r9): at sf0.1 the DuckDB side of the exhaustive-Jaccard
# closure oracles (q93/q168/q171/q172/q173/q180/q182 share exactPairsCte
# — an all-pairs inequality join DuckDB runs near-serially) costs ~30-40
# MINUTES EACH. The full sf0.1 leg is an overnight run; for targeted
# work, verify those at sf0.01 and spot-check the rest at sf0.1.
set -euo pipefail
cd "$(dirname "$0")/.."
SFS=("${@:-sf0.01 sf0.1}")
[ $# -eq 0 ] && SFS=(sf0.01 sf0.1)
fail=0
for sf in "${SFS[@]}"; do
  out="/tmp/gverify_${sf}"
  echo "== Verify ${sf} -> ${out}"
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    sbt -batch "runMain graft.Verify /root/testdata/${sf} ${out}" \
    | grep -E '\[verify\]' || true
  echo "== Oracle check ${sf} (dtype-strict)"
  # show everything except the per-query PASS lines; pipefail propagates
  # the checker's exit status through the awk filter
  python3 tools/oracle_check.py "${out}" "/root/testdata/${sf}" \
    | awk '!/^PASS/' || fail=1
done
if [ "$fail" -ne 0 ]; then echo "DUAL-SF SWEEP: FAIL"; exit 1; fi
echo "DUAL-SF SWEEP: GREEN"
