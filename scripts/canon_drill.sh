#!/bin/bash
# Two-session full-registry canon-dump drill (round-14 directive #4):
# the README's "two full-session canon dumps byte-identical" claim
# becomes a reproducible committed artifact. Runs graft.Verify TWICE in
# fresh JVMs with SPARK_GRAFT_CANON_DUMP (each dumps, per query, the
# exact canonicalized plan string QueryStats.planHash hashes — the
# full-session context the r13 RewriteDistinctAggregates flip only
# reproduced in), diffs the two dumps per query, and re-runs
# graft.CanonProbe (ExprId-burn harness) on the two formerly-flipping
# queries as recorded evidence of the r13 root-cause fix. Writes
# CANON_DRILL_r{round}.json; exits non-zero on any diff or probe flip.
#
# Usage: scripts/canon_drill.sh [round] [sfDir]   (default sf0.001 —
# the canon string depends on plan shape, not corpus size, and the
# full registry at sf0.001 keeps the drill ~minutes)
set -e
cd "$(dirname "$0")/.."
ROUND="${1:-14}"
SF="${2:-/root/testdata/sf0.001}"
OUT="CANON_DRILL_r${ROUND}.json"
WORK="$(mktemp -d /tmp/canon_drill.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

run_session() {  # $1 = session tag
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  SPARK_GRAFT_HISTORY_DIR="" \
  SPARK_GRAFT_CANON_DUMP="$WORK/$1" \
  scripts/run_class.sh graft.Verify "$SF" "$WORK/verify_$1" \
    >"$WORK/$1.out" 2>&1
}

echo "[canon-drill] session A (full-registry Verify + canon dump)" >&2
run_session a
echo "[canon-drill] session B (fresh JVM, same registry)" >&2
run_session b

echo "[canon-drill] CanonProbe on the r13 formerly-flipping queries" >&2
scripts/run_class.sh graft.CanonProbe "$SF" 20 \
  f_pseudo_columns d_query_stats >"$WORK/probe.out" 2>"$WORK/probe.err"

python3 - "$OUT" "$ROUND" "$SF" "$WORK" <<'EOF'
import glob, json, os, re, sys
out, rnd, sf, work = sys.argv[1:]
a = {os.path.basename(p)[:-6]: open(p).read()
     for p in glob.glob(f"{work}/a/*.canon")}
b = {os.path.basename(p)[:-6]: open(p).read()
     for p in glob.glob(f"{work}/b/*.canon")}
common = sorted(set(a) & set(b))
only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))
diffs = sorted(q for q in common if a[q] != b[q])
probe = dict(re.findall(r"CANONPROBE (\S+) flips=(\S+)",
                        open(f"{work}/probe.out").read()))
probe_clean = probe and all(v.startswith("0/") for v in probe.values())
ok = (len(common) > 0 and not diffs and not only_a and not only_b
      and probe_clean)
json.dump({"drill": "two_session_canon_dump",
           "round": int(rnd), "sf": sf, "sessions": 2,
           "queries": len(common), "identical": len(common) - len(diffs),
           "diffs": diffs, "only_in_one_session": only_a + only_b,
           "canonprobe_exprid_burn": probe,
           "canonprobe_clean": probe_clean, "ok": ok},
          open(out, "w"), indent=1)
print(("PASS " if ok else "FAIL ")
      + f"{out}: {len(common)} queries, {len(diffs)} diffs, "
      + f"probe {probe}")
sys.exit(0 if ok else 1)
EOF
