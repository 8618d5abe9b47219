#!/bin/bash
# Mixed-leg verdict drill — prove the conc4 bound check AND its
# anomaly-confirm re-leg can fire (the verdict-machinery analog of
# scripts/regression_drill.sh: a verdict that has only ever printed
# green is unproven until a planted failure walks the whole path).
#
# SPARK_GRAFT_MIXED_PLANT="<query>:<everyN>:<ms>" sleeps ms inside
# every Nth CONCURRENT sample of the named query (reader threads only
# — serial references stay clean), creating a genuine TAIL violation:
# p95 blows the bound while p50 stays sane. The first leg trips, the
# confirm re-leg re-observes with the plant still active, the
# violation reproduces, and the artifact records
# ok:false reason:"p95_bound" confirm_ran:true with the query named
# in both violation lists (ok:null reason:"contended" if the machine
# happened to be contended — the drill asserts ok != true either
# way). A clean stage then shows ok:true.
#
# Round-15 stages: the settle-and-re-leg path (directive #2 — a
# verdict that would be WITHHELD on leg-window evidence settles and
# runs one more leg instead of ending the round unanswered).
# SPARK_GRAFT_CONC4_STEAL_PLANT="a,b,c" fakes the per-observation
# leg-steal READINGS (one per leg, last reused; recorded in `plants`
# — update_readme_bench.py refuses such artifacts):
#   - "6.0,6.0,0.3": legs 1+2 dirty → withhold-shaped → settle →
#     QUIET re-leg, plant still violating → the verdict RESOLVES to
#     false/p95_bound with settle.used:"releg" (pre-r15 this round
#     ended null/"contended");
#   - "6.0,6.0,6.0": re-leg still dirty → verdict stays withheld,
#     both windows' steal recorded, settle.used:"first".
#
# Usage: scripts/conc4_drill.sh [round]   (default round: 12)
# Writes CONC4_DRILL_r{round}.json; exits non-zero on FAIL.
set -e
cd "$(dirname "$0")/.."
ROUND="${1:-12}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
PLANT_Q="q06_forecast_revenue"
OUT="CONC4_DRILL_r${ROUND}.json"

run_bench() {  # $1 = mixed plant spec ("" = clean); $2 = steal plant ("")
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  SPARK_GRAFT_HISTORY_DIR="" \
  SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_EXT=0 \
  SPARK_GRAFT_BENCH_USERS=1 SPARK_GRAFT_BENCH_MIXED=12 \
  SPARK_GRAFT_SOAK_CYCLES=0 SPARK_GRAFT_SCALING_FACTOR=1 \
  SPARK_GRAFT_BENCH_FULLREG=0 SPARK_GRAFT_BENCH_RETRY=0 \
  SPARK_GRAFT_MIXED_PLANT="$1" SPARK_GRAFT_CONC4_STEAL_PLANT="$2" \
  scripts/run_class.sh graft.Bench >/dev/null 2>/tmp/conc4_drill_stderr.log
  python3 -c 'import json; j = json.load(open("bench_out.json")); \
c = j["concurrent4"]; \
print(json.dumps({"ok": c.get("ok"), "reason": c.get("reason"), \
"confirm_ran": c.get("confirm_ran"), "violations": c.get("violations"), \
"violations_first": c.get("violations_first"), \
"violations_second": c.get("violations_second"), \
"settle": c.get("settle"), "steal_pct": c.get("steal_pct"), \
"consistent": c.get("consistent"), "plants": j.get("plants")}))'
}

echo "[conc4-drill] planted run (${PLANT_Q}, every 5th sample +1500ms)" >&2
PLANTED="$(run_bench "${PLANT_Q}:5:1500" "")"
echo "[conc4-drill] settle-resolve run (dirty,dirty,quiet steal plant)" >&2
SETTLED="$(run_bench "${PLANT_Q}:5:1500" "6.0,6.0,0.3")"
echo "[conc4-drill] settle-still-dirty run (dirty steal plant throughout)" >&2
STILLDIRTY="$(run_bench "${PLANT_Q}:5:1500" "6.0,6.0,6.0")"
echo "[conc4-drill] clean run" >&2
CLEAN="$(run_bench "" "")"

python3 - "$OUT" "$PLANT_Q" "$PLANTED" "$SETTLED" "$STILLDIRTY" "$CLEAN" <<'EOF'
import json, sys
out, plant_q, planted_s, settled_s, dirty_s, clean_s = sys.argv[1:]
planted, settled = json.loads(planted_s), json.loads(settled_s)
dirty, clean = json.loads(dirty_s), json.loads(clean_s)
def names(vs): return {v.split(":")[0] for v in (vs or [])}
MIX = f"mixed:{plant_q}:5:1500"
tripped = (planted["ok"] is not True and planted["confirm_ran"] is True
           and plant_q in names(planted["violations"])
           and plant_q in names(planted["violations_first"])
           and plant_q in names(planted["violations_second"])
           and planted["consistent"] is True
           # the artifact must self-identify as planted (ADVICE r12)
           and planted["plants"] == [MIX])
# settle-resolve: both observed windows dirty -> settle -> quiet
# re-leg -> the verdict RESOLVES (plant still active, so an honest
# false/p95_bound on the quiet window) instead of ending withheld
st = settled.get("settle") or {}
settle_resolved = (st.get("ran") is True and st.get("used") == "releg"
                   and st.get("releg_dirty") is False
                   and st.get("steal_first") == 6.0
                   and settled["steal_pct"] == 0.3
                   and settled["ok"] is False
                   and settled["reason"] == "p95_bound"
                   and plant_q in names(settled["violations"])
                   and settled["consistent"] is True
                   and settled["plants"] ==
                       [MIX, "conc4steal:6.0,6.0,0.3"])
# settle-still-dirty: the re-leg window is dirty too -> the original
# withheld verdict stands with BOTH windows' steal recorded
sd = dirty.get("settle") or {}
still_dirty = (sd.get("ran") is True and sd.get("used") == "first"
               and sd.get("releg_dirty") is True
               and sd.get("steal_first") == 6.0
               and sd.get("steal_releg") == 6.0
               and dirty["ok"] is None
               and dirty["reason"] == "contended"
               and dirty["consistent"] is True
               and dirty["plants"] == [MIX, "conc4steal:6.0,6.0,6.0"])
clean_ok = (clean["ok"] is True and not clean["violations"]
            and (clean.get("settle") or {}).get("ran") is False
            and clean["plants"] == [])
ok = tripped and settle_resolved and still_dirty and clean_ok
json.dump({"drill": "conc4_verdict_confirm_releg", "planted_query": plant_q,
           "plant": "every 5th concurrent sample +1500ms",
           "planted_stage": planted, "settle_resolve_stage": settled,
           "settle_still_dirty_stage": dirty, "clean_stage": clean,
           "tripped_and_confirmed": tripped,
           "settle_resolved": settle_resolved,
           "settle_still_dirty": still_dirty, "clean_ok": clean_ok,
           "ok": ok}, open(out, "w"), indent=1)
print(("PASS " if ok else "FAIL ") + out)
sys.exit(0 if ok else 1)
EOF
