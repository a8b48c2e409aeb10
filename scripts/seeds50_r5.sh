#!/bin/bash
# Round-5 closure of the "50-seed suites in flight" loose end (VERDICT r4
# weak #6): run the closed-loop Panda success suites at n=50 sequentially
# (single host core), CPU-pinned, and deposit both raw logs and the final
# JSON summary lines into docs/tpu_session_r05/seeds50.md so the numbers
# land in git even if the session that armed this is gone.
#
# Order: native kinematic, native dynamics (each ~1-2 h), then the ACTUAL
# reference through the torch_robotics shim (torch CPU f64 — slowest, run
# last; bound it so the round never starves).
set -u
PY=/opt/venv/bin/python
OUT=/tmp/seeds50
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run_suite() {
  local name="$1"; shift
  echo "=== [$name] start $(date -u +%H:%M:%S)" | tee -a "$OUT/driver.log"
  timeout "${SUITE_TIMEOUT:-14400}" env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    "$PY" benchmarks/success_rate_panda.py "$@" > "$OUT/$name.log" 2>&1
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S)" | tee -a "$OUT/driver.log"
  tail -1 "$OUT/$name.log" | tee -a "$OUT/driver.log"
}

run_suite native_kinematic_50 --seeds 50 --iters 300 --physics kinematic
run_suite native_dynamics_50  --seeds 50 --iters 300 --physics dynamics
SUITE_TIMEOUT=${REF_TIMEOUT:-21600} \
run_suite reference_kinematic_50 --seeds 50 --iters 300 --planner reference

mkdir -p docs/tpu_session_r05
{
  echo "# 50-seed closed-loop Panda suites ($(date -u +%Y-%m-%dT%H:%MZ))"
  echo
  echo "Per-suite summary lines (full per-episode logs in /tmp/seeds50):"
  for name in native_kinematic_50 native_dynamics_50 reference_kinematic_50; do
    [ -f "$OUT/$name.log" ] || continue
    echo
    echo "## $name"
    echo '```json'
    grep '^{"planner"' "$OUT/$name.log" || tail -2 "$OUT/$name.log"
    echo '```'
  done
} > docs/tpu_session_r05/seeds50.md
echo "summary written: docs/tpu_session_r05/seeds50.md" | tee -a "$OUT/driver.log"
