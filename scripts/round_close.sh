#!/usr/bin/env bash
# Round-close gate-artifact regeneration (r12 verdict #5): every graded
# artifact must be produced FROM THE FINAL TREE, in this order, and
# committed as the round's LAST commits — r12's sf0.1 screen predated two
# behavior-touching commits, which is exactly the drift this script
# prevents. Each artifact records the HEAD it ran on.
#
# Usage: scripts/round_close.sh <round-number> [fast]
#   fast   skip the sf0.1 screen and the fuzz gate (iteration runs only —
#          a round close must run the full sequence)
#
# Order (each step aborts the close on failure):
#   1. full `sbt test`
#   2. Verify dump + DuckDB oracle at sf0.01      (the driver's gate shape)
#   3. full Verify at sf0.1 + per-query subprocess screen
#   4. adversarial-fixture fuzz gate (all variants)
#   5. bench at sf0.1 (floors refreshed)
#   6. PLANS.md regeneration
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?round number, e.g. 13}"
MODE="${2:-full}"
HEAD_SHA=$(git rev-parse HEAD)
if [ -n "$(git status --porcelain)" ]; then
  echo "round_close: tree is DIRTY (including untracked files) — commit" \
       "first; artifacts must record the exact HEAD they ran on" >&2
  exit 1
fi
echo "== round_close r$ROUND on $HEAD_SHA (mode: $MODE)"
STAMP() { python3 - "$1" "$HEAD_SHA" <<'EOF'
import json, sys
p, sha = sys.argv[1], sys.argv[2]
d = json.load(open(p))
d["head"] = sha
json.dump(d, open(p, "w"), indent=1)
EOF
}

echo "== 1/6 sbt test"
sbt -batch test

echo "== 2/6 Verify + oracle @ sf0.01"
rm -rf /tmp/rc_vout001
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/rc_vout001"
python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/rc_vout001 \
  "CORRECTNESS_local_r${ROUND}.json"
STAMP "CORRECTNESS_local_r${ROUND}.json"

if [ "$MODE" = "full" ]; then
  echo "== 3/6 Verify + screen @ sf0.1"
  rm -rf /tmp/rc_vout01
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/rc_vout01"
  python3 scripts/sf_screen.py /root/testdata/sf0.1 /tmp/rc_vout01 \
    "CORRECTNESS_sf01_r${ROUND}.json"
  STAMP "CORRECTNESS_sf01_r${ROUND}.json"

  echo "== 4/6 fuzz gate (all variants)"
  rm -rf /tmp/rc_fuzz
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
    sbt -batch "runMain graft.tools.FuzzGate /root/testdata/sf0.01 /tmp/rc_fuzz"
  python3 scripts/fuzz_gate.py /tmp/rc_fuzz "CORRECTNESS_fuzz_r${ROUND}.json"
  STAMP "CORRECTNESS_fuzz_r${ROUND}.json"
else
  echo "== 3-4/6 SKIPPED (fast mode — not a valid round close)"
fi

echo "== 5/6 bench @ sf0.1 (floors refreshed)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Bench"
STAMP BENCH_QUERIES.json
BENCH_FLAGGED=0
python3 scripts/bench_compare.py || {
  BENCH_FLAGGED=1
  echo "round_close: bench gate FLAGGED movers — adjudicate before" \
       "committing the snapshot (SCALE.md protocol)" >&2; }

echo "== 6/6 PLANS.md"
sbt -batch "runMain graft.tools.PlanDump"

if [ "$BENCH_FLAGGED" = "1" ]; then
  echo "== round_close r$ROUND ran on $HEAD_SHA but the BENCH GATE" \
       "FLAGGED MOVERS — adjudicate (SCALE.md protocol) BEFORE committing" \
       "BENCH_QUERIES.json" >&2
  exit 2
fi
echo "== round_close r$ROUND complete on $HEAD_SHA — review artifacts," \
     "then commit them as the round's LAST commits"
