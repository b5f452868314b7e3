#!/usr/bin/env bash
# Mechanized round close (VERDICT r16 task 3 — fourth carry of the
# dirty-round-end blemish). Runs the local gates, then stages and commits
# every round artifact the policy says is committed-per-round
# (README.md "Round-artifact policy"), and FAILS if any tracked artifact
# is still dirty afterwards — enforcement, not memory.
#
# Usage: scripts/round_close.sh [--skip-bench] [--skip-verify]
#   --skip-bench   don't re-run the official bench (use when a clean
#                  guard-accepted record already exists this session)
#   --skip-verify  don't re-run the sf0.01 correctness replica
set -euo pipefail
cd "$(dirname "$0")/.."

SKIP_BENCH=0
SKIP_VERIFY=0
for a in "$@"; do
  case "$a" in
    --skip-bench)  SKIP_BENCH=1 ;;
    --skip-verify) SKIP_VERIFY=1 ;;
    *) echo "unknown arg: $a" >&2; exit 2 ;;
  esac
done

CP="target/scala-2.13/classes:/opt/spark/jars/*"

sbt -batch compile 1>&2

if [ "$SKIP_VERIFY" -eq 0 ]; then
  echo "[round_close] correctness replica (sf0.01)…" >&2
  rm -rf target/verify_close
  SPARK_GRAFT_CPUS=32 java -cp "$CP" graft.Verify \
    /root/testdata/sf0.01 target/verify_close 2>target/verify_close.err
  python3 scripts/oracle_check.py /root/testdata/sf0.01 target/verify_close
fi

if [ "$SKIP_BENCH" -eq 0 ]; then
  echo "[round_close] official bench (sf0.1, cpus=32)…" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    java -cp "$CP" graft.Bench
fi

# Stage every per-round artifact — the committed snapshots the local runs
# refresh (BENCH_LOCAL/BENCH_CLEAN/BENCH_QUERIES) AND any driver drops
# (BENCH_r*/CORRECTNESS_r*/LEAKCHECK/COPYCHECK) sitting untracked from the
# previous round boundary.
# add each artifact individually: `git add` fails ATOMICALLY on a missing
# pathspec (e.g. COPYCHECK.json before the driver first drops it), and the
# old single-command form silently staged NOTHING in that case
# suspect-ledger gate (VERDICT r18 task 7): every record suspect the
# bench flagged in the committed ledger must carry a SCALING.md anchor
# (the query name appears in SCALING.md) before the round may close —
# the "explain each" discipline as enforcement, not memory.
if [ -f SUSPECTS.json ]; then
  python3 - <<'EOF'
import json, sys
d = json.load(open("SUSPECTS.json"))
scaling = open("SCALING.md").read()
missing = [s["q"] for s in d.get("suspects", []) if s["q"] not in scaling]
if missing:
    print("[round_close] FAIL: record suspects lack SCALING.md anchors: "
          + ", ".join(missing), file=sys.stderr)
    sys.exit(1)
EOF
fi

# skip gitignored artifacts (e.g. COPYCHECK.json per the README policy):
# `git add` on an ignored pathspec exits non-zero and would abort the sweep
for f in BENCH_LOCAL.json BENCH_CLEAN.json BENCH_QUERIES.json \
         LEAKCHECK.json COPYCHECK.json SCALING.md SUSPECTS.json \
         BENCH_r*.json CORRECTNESS_r*.json; do
  [ -e "$f" ] || continue
  git check-ignore -q -- "$f" && continue
  git add -A -- "$f"
done
if ! git diff --cached --quiet; then
  git commit -m "Round close: refresh committed bench/correctness artifacts"
fi

# Enforcement: the round must end with every round artifact clean. Other
# dirt (source files) is reported but does not fail — committing source is
# the builder's explicit act, not this script's.
DIRTY=$(git status --porcelain -- BENCH_LOCAL.json BENCH_CLEAN.json \
  BENCH_QUERIES.json LEAKCHECK.json COPYCHECK.json BENCH_r*.json \
  CORRECTNESS_r*.json 2>/dev/null || true)
if [ -n "$DIRTY" ]; then
  echo "[round_close] FAIL: round artifacts still dirty:" >&2
  echo "$DIRTY" >&2
  exit 1
fi
OTHER=$(git status --porcelain)
if [ -n "$OTHER" ]; then
  echo "[round_close] note: non-artifact files dirty (commit them yourself):" >&2
  echo "$OTHER" >&2
fi
echo "[round_close] OK: round artifacts clean"
