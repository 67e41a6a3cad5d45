#!/usr/bin/env bash
# Round-closing routine (VERDICT r10 #7): every step a closing commit must
# pass, in order, so artifacts cannot drift from the code. Run from the
# repo root on a quiet machine:
#
#   tools/close.sh [sf_dir] [verify_out]
#
# Steps:
#   1. sbt test                        — full suite green
#   2. graft.Verify at sf_dir          — result parquets + oracle_sql.json
#   3. tools/check_oracle.py           — local DuckDB mirror of the driver gate
#   4. tools/gen_operators.py          — regenerate docs/OPERATORS.md from the
#                                        FRESH oracle_sql.json (hand-edited
#                                        counts drifted in round 10); fails the
#                                        close if the generated row count does
#                                        not match SparkEntry.queries
#   5. git diff --exit-code docs/      — regenerated index must already be
#                                        committed (or the close stops here)
#
# The quiet bench runs (BENCH_BASELINE refresh) stay manual — they need an
# idle machine and judgment about which rows changed; see PLANS.md
# "Bench methodology".
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
OUT="${2:-target/close-verify}"

echo "== close 1/5: sbt test"
sbt -batch test

echo "== close 2/5: Verify @ $SF_DIR"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF_DIR $OUT"

echo "== close 3/5: DuckDB oracle mirror"
# ADVICE r11: ORACLE_TIMEOUT_SEC is an sf1-sweep convenience; if it leaks
# into a closing run, timed-out oracles would be SKIPPED comparisons. The
# gate must compare everything — unset it here. (check_oracle.py also
# returns rc=2 on any timeout now, so even a future regression here fails
# the close under set -e.)
env -u ORACLE_TIMEOUT_SEC python3 tools/check_oracle.py "$OUT" "$SF_DIR"

echo "== close 4/5: regenerate docs/OPERATORS.md"
python3 tools/gen_operators.py "$OUT/oracle_sql.json"
# row-count cross-check: the generated index must cover every query
# (count only between the BEGIN/END markers — the hand-written prose
# above them contains its own tables)
GEN=$(awk '/BEGIN GENERATED INDEX/,/END GENERATED INDEX/' docs/OPERATORS.md \
  | grep -c '^| `' || true)
SQL=$(python3 - "$OUT/oracle_sql.json" <<'EOF'
import json, sys
print(len(json.load(open(sys.argv[1]))))
EOF
)
N=$(ls "$OUT" | grep -v oracle_sql.json | wc -l)
echo "   generated rows: $GEN; verify results: $N; sql oracles: $SQL"
if [ "$GEN" -ne "$N" ]; then
  echo "CLOSE FAILED: OPERATORS.md rows ($GEN) != SparkEntry.queries ($N)" >&2
  exit 1
fi
# family-count header cross-check (VERDICT r11 #6): the generated header
# table's total row must equal the generated index row count
TOT=$(awk '/BEGIN GENERATED FAMILY COUNTS/,/END GENERATED FAMILY COUNTS/' docs/OPERATORS.md \
  | grep '^| \*\*total\*\*' | grep -o '[0-9]\+' || echo 0)
echo "   family-count header total: $TOT"
if [ "$TOT" -ne "$GEN" ]; then
  echo "CLOSE FAILED: OPERATORS.md family-count total ($TOT) != index rows ($GEN)" >&2
  exit 1
fi

echo "== close 5/5: docs in sync with HEAD"
# diff against HEAD (not just the worktree) so staged-but-uncommitted
# docs/ changes also fail the close (ADVICE r11)
git diff --exit-code HEAD -- docs/ || {
  echo "CLOSE FAILED: regenerated docs differ from HEAD — commit them" >&2
  exit 1
}
echo "close: all gates green"
