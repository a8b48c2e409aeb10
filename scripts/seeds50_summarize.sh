#!/bin/bash
# Regenerate docs/tpu_session_r05/seeds50.md from whatever /tmp/seeds50
# logs exist RIGHT NOW — run any time (the seeds50_r5.sh runner writes the
# same summary only when all three suites finish; this standalone lets an
# interrupted run's partial evidence be committed).
set -u
OUT=/tmp/seeds50
cd "$(dirname "$0")/.."
mkdir -p docs/tpu_session_r05
{
  echo "# 50-seed closed-loop Panda suites ($(date -u +%Y-%m-%dT%H:%MZ))"
  echo
  echo "Per-suite summary lines; per-episode JSON follows each summary when"
  echo "the suite is still in flight (full logs in /tmp/seeds50):"
  for name in native_kinematic_50 native_dynamics_50 reference_kinematic_50; do
    [ -f "$OUT/$name.log" ] || continue
    echo
    echo "## $name"
    echo '```json'
    if grep -q '^{"planner"' "$OUT/$name.log"; then
      grep '^{"planner"' "$OUT/$name.log"
    else
      grep -c '^{"seed"' "$OUT/$name.log" | sed 's/^/(in flight: episodes done: /;s/$/)/'
      grep '^{"seed"' "$OUT/$name.log" | tail -5
    fi
    echo '```'
  done
} > docs/tpu_session_r05/seeds50.md
echo "wrote docs/tpu_session_r05/seeds50.md"
