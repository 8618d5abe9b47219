#!/bin/bash
# Flake-ledger step of the round close (round-15 directive #5): the
# CatalogSpec race tests run under a retry-once-and-RECORD tripwire
# that appends any first-try failure — WITH THE TEST NAME — to
# target/flake_incidents/_incidents/log. That path is gitignored
# build scratch, so a captured flake was reviewable only until the
# next `sbt clean`. This script surfaces the captured lines into the
# COMMITTED ledger (FLAKES.md) once per round — the empty case is
# recorded too ("none"), so a silent round is distinguishable from a
# round where nobody looked — and then archives the scratch log so
# the next round's entry is incremental, not cumulative.
#
# Usage: scripts/flake_ledger.sh <round>
# Appends one round entry to FLAKES.md; exits non-zero if the entry
# did not land (the self-assertion the directive asks for).
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/flake_ledger.sh <round>}"
LEDGER="FLAKES.md"
LOGDIR="target/flake_incidents/_incidents"
STAMP="$(date -u +%Y-%m-%d)"

if [ ! -f "$LEDGER" ]; then
  cat > "$LEDGER" <<'EOF'
# Flake ledger

One entry per round: every `test_flake` incident the CatalogSpec
retry-once-and-record tripwire captured during that round's test runs
(line format: `<epoch_ms> <pid> test_flake <test_name_underscored>
<exception head>`), or `none`. Appended by `scripts/flake_ledger.sh`
at round close; the gitignored scratch log is archived after each
entry so entries are incremental. A name that recurs across rounds is
a real race to chase, not environment noise.
EOF
fi

# collect test_flake lines from the rotated + live scratch logs
LINES=""
for f in "$LOGDIR/log.1" "$LOGDIR/log"; do
  if [ -f "$f" ]; then
    L="$(awk '$3 == "test_flake"' "$f" || true)"
    [ -n "$L" ] && LINES="${LINES}${LINES:+$'\n'}${L}"
  fi
done

{
  echo ""
  echo "## round $ROUND ($STAMP)"
  if [ -n "$LINES" ]; then
    echo '```'
    echo "$LINES"
    echo '```'
  else
    echo "none"
  fi
} >> "$LEDGER"

# archive the scratch log so next round's entry is incremental
if [ -d "$LOGDIR" ]; then
  for f in "$LOGDIR/log.1" "$LOGDIR/log"; do
    [ -f "$f" ] && mv "$f" "$f.ledgered_r$ROUND"
  done
fi

# self-assertion: the round's entry (and its content class) must be
# the ledger's last entry — covers the empty case explicitly
EXPECT="none"
[ -n "$LINES" ] && EXPECT='```'
if tail -5 "$LEDGER" | grep -q "^## round $ROUND " \
   && tail -4 "$LEDGER" | grep -qF "$EXPECT"; then
  N=0
  [ -n "$LINES" ] && N="$(printf '%s\n' "$LINES" | wc -l)"
  echo "PASS FLAKES.md round $ROUND entry appended ($N flake line(s))"
else
  echo "FAIL FLAKES.md round $ROUND entry missing" >&2
  exit 1
fi
