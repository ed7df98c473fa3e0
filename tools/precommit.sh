#!/usr/bin/env bash
# Pre-snapshot gate (VERDICT r14 item 3): a round can never close red.
#
#   tools/precommit.sh                 # compile + test-compile + entry smoke
#   tools/precommit.sh q266 q267       # ... plus execute named queries at sf0.001
#   tools/precommit.sh --all           # ... plus execute EVERY query (slow)
#
# Exit 0 = safe to commit. Run before every end-of-round snapshot and
# before any commit that touches SparkEntry.scala.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[precommit] sbt compile + Test/compile"
sbt -batch ";compile;Test/compile" 2>&1 | tail -3

# NOTE: this sbt's log config suppresses [success] lines for runMain —
# the EXIT CODE is the only reliable signal (captured via PIPESTATUS;
# graft.Smoke exits nonzero when any named query fails).
if [ "$#" -gt 0 ]; then
  echo "[precommit] smoke-running queries at sf0.001: $*"
  set +e
  sbt -batch "runMain graft.Smoke $*" 2>&1 | grep -E '^\[smoke\]'
  rc=${PIPESTATUS[0]}
  set -e
else
  echo "[precommit] entry smoke"
  set +e
  sbt -batch "runMain graft.Smoke" 2>&1 | grep -E '^\[smoke\]'
  rc=${PIPESTATUS[0]}
  set -e
fi
if [ "$rc" -ne 0 ]; then echo "[precommit] SMOKE FAILED (rc=$rc)"; exit 1; fi
echo "[precommit] OK"
