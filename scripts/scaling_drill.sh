#!/bin/bash
# Scaling-leg verdict drill — prove the scal_ok bound check and its
# in-leg x1/xN pair-confirm can fire (round-13 directive: the conc4
# verdict got this treatment in round 12; the scaling ratios, which
# drive SCALE.md's ratio bound, deserve the same — a verdict that has
# only ever printed green is unproven).
#
# SPARK_GRAFT_SCALING_PLANT="<query>:<ms>" sleeps ms inside the named
# query's timed window ONLY on scaled-up corpora (dir != sfDir), so the
# x1 denominators stay clean and the planted wall inflates exactly the
# xN side of the ratio — the shape a genuine super-linear regression
# has. The leg detects the breach, re-measures the x1/xN pair once
# (plant still active → reproduces), records the violation, and the
# emit-time verdict reads ok:false reason:"ratio_bound" on a quiet
# machine (ok:null reason:"contended" if the window was contended —
# the drill asserts ok != true either way). A clean stage then shows
# ok:true with empty violations. Both stages also assert the artifact's
# `plants` field (ADVICE r12): the planted stage must self-identify,
# the clean stage must read [].
#
# Usage: scripts/scaling_drill.sh [round]   (default round: 13)
# Writes SCALING_DRILL_r{round}.json; exits non-zero on FAIL.
set -e
cd "$(dirname "$0")/.."
ROUND="${1:-13}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
PLANT_Q="x_dedup_chunks"
PLANT_MS=4000
OUT="SCALING_DRILL_r${ROUND}.json"

run_bench() {  # $1 = scaling plant spec ("" for a clean run)
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  SPARK_GRAFT_HISTORY_DIR="" \
  SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_EXT=0 \
  SPARK_GRAFT_BENCH_USERS=1 SPARK_GRAFT_BENCH_MIXED=0 \
  SPARK_GRAFT_SOAK_CYCLES=0 SPARK_GRAFT_SCALING_FACTOR=8 \
  SPARK_GRAFT_SCALING27=0 SPARK_GRAFT_BENCH_FULLREG=0 \
  SPARK_GRAFT_BENCH_RETRY=0 \
  SPARK_GRAFT_SCALING_PLANT="$1" \
  scripts/run_class.sh graft.Bench >/dev/null 2>/tmp/scaling_drill_stderr.log
  python3 -c 'import json; j = json.load(open("bench_out.json")); \
print(json.dumps({"scal_ok": j.get("scal_ok"), \
"scal_reason": j.get("scal_reason"), \
"scal_violations": j.get("scal_violations"), \
"scal_confirmed": j.get("scal_confirmed"), \
"plants": j.get("plants"), "contended": j.get("contended")}))'
}

echo "[scaling-drill] planted run (${PLANT_Q} xN +${PLANT_MS}ms)" >&2
PLANTED="$(run_bench "${PLANT_Q}:${PLANT_MS}")"
echo "[scaling-drill] clean run" >&2
CLEAN="$(run_bench "")"

python3 - "$OUT" "$PLANT_Q" "$PLANT_MS" "$PLANTED" "$CLEAN" <<'EOF'
import json, sys
out, plant_q, plant_ms, planted_s, clean_s = sys.argv[1:]
planted, clean = json.loads(planted_s), json.loads(clean_s)
def names(vs): return {v.split(":")[0] for v in (vs or [])}
# planted stage: the breach must be detected, pair-confirmed (the
# query lands in scal_confirmed), reproduce into scal_violations, and
# the verdict must NOT be true (false/ratio_bound on a quiet machine,
# null/contended on a loaded one); the artifact must self-identify as
# planted
tripped = (planted["scal_ok"] is not True
           and plant_q in names(planted["scal_violations"])
           and plant_q in (planted["scal_confirmed"] or [])
           and planted["plants"] == [f"scaling:{plant_q}:{plant_ms}"])
# clean stage: verdict true, nothing recorded, no plant in the artifact
clean_ok = (clean["scal_ok"] is True and not clean["scal_violations"]
            and clean["plants"] == [])
ok = tripped and clean_ok
json.dump({"drill": "scaling_verdict_pair_confirm",
           "planted_query": plant_q,
           "plant": f"xN leg +{plant_ms}ms (x1 denominators clean)",
           "planted_stage": planted, "clean_stage": clean,
           "tripped_and_confirmed": tripped, "clean_ok": clean_ok,
           "ok": ok}, open(out, "w"), indent=1)
print(("PASS " if ok else "FAIL ") + out)
sys.exit(0 if ok else 1)
EOF
