#!/bin/bash
# Regression drill — prove the LIVE bench tripwire can fire.
#
# d_query_regression gates the detector's math on crafted history; this
# drill instead forces a slowdown through the REAL pipeline: headline
# bench runs append bench_* batches into a fresh history root, and the
# bench_*-scoped trailing-median tripwire must read
#   0 (three clean priors) -> >=1 naming the planted query -> 0 (clean).
#
# SPARK_GRAFT_BENCH_PLANT=<query>:<ms> sleeps inside the timed window,
# so the planted wall flows the identical path a genuine regression
# would: timer -> QueryStats.append(bench_*) -> scoped median -> the
# artifact's `regressions`/`regression_names` fields.
#
# Usage: scripts/regression_drill.sh [round]   (default round: 12)
# Writes REGRESSION_DRILL_r{round}.json; exits non-zero on FAIL.
set -e
cd "$(dirname "$0")/.."
ROUND="${1:-12}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
PLANT_Q="q06_forecast_revenue"
PLANT_MS=3000
HIST="$(mktemp -d /tmp/graft_drill_hist.XXXXXX)"
trap 'rm -rf "$HIST"' EXIT
OUT="REGRESSION_DRILL_r${ROUND}.json"

run_bench() {  # $1 = plant spec ("" for a clean run)
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  SPARK_GRAFT_HISTORY_DIR="$HIST" \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_EXT=0 \
  SPARK_GRAFT_BENCH_USERS=1 SPARK_GRAFT_BENCH_MIXED=0 \
  SPARK_GRAFT_SOAK_CYCLES=0 SPARK_GRAFT_SCALING_FACTOR=1 \
  SPARK_GRAFT_BENCH_FULLREG=0 SPARK_GRAFT_BENCH_RETRY=0 \
  SPARK_GRAFT_BENCH_PLANT="$1" \
  scripts/run_class.sh graft.Bench >/dev/null 2>/tmp/regression_drill_stderr.log
  python3 -c 'import json; j = json.load(open("bench_out.json")); \
print(json.dumps({"regressions": j["regressions"], \
"regression_names": j["regression_names"], "plants": j.get("plants")}))'
}

stages=()
for i in 1 2 3; do
  echo "[drill] clean run $i/5" >&2
  stages+=("$(run_bench "")")
done
echo "[drill] planted run 4/5 (${PLANT_Q} +${PLANT_MS}ms)" >&2
stages+=("$(run_bench "${PLANT_Q}:${PLANT_MS}")")
echo "[drill] clean run 5/5" >&2
stages+=("$(run_bench "")")

python3 - "$OUT" "$PLANT_Q" "$PLANT_MS" "${stages[@]}" <<'EOF'
import json, sys
out, plant_q, plant_ms, *stages = sys.argv[1:]
s = [json.loads(x) for x in stages]
# the planted query must be absent from every clean verdict and present
# (as a wall_regression) in the planted one; the clean stages must read
# a fully-zero tripwire so the demo is unambiguous
clean_before = all(
    x["regressions"] == 0 and x["plants"] == [] for x in s[:3])
fired = (s[3]["regressions"] >= 1 and any(
    n == plant_q + ":wall_regression" for n in s[3]["regression_names"])
    # the planted artifact must self-identify (ADVICE r12)
    and s[3]["plants"] == [f"bench:{plant_q}:{plant_ms}"])
clean_after = s[4]["regressions"] == 0 and s[4]["plants"] == []
ok = clean_before and fired and clean_after
json.dump({"drill": "live_regression_tripwire", "planted_query": plant_q,
           "planted_ms": int(plant_ms), "stages": s,
           "clean_before": clean_before, "fired_on_plant": fired,
           "clean_after": clean_after, "ok": ok},
          open(out, "w"), indent=1)
print(("PASS " if ok else "FAIL ") + out)
sys.exit(0 if ok else 1)
EOF
