#!/bin/bash
# Round-4 hardware agenda, run sequentially the moment the TPU tunnel is
# live (one TPU process at a time — single tunneled chip). Each stage logs
# to /tmp/tpu_r4/ and a failure does not stop later stages (the numbers
# are independent). Expected wall time: 30-90 min depending on how much of
# the remote compile cache survives.
#
# Usage: bash scripts/tpu_session_r4.sh [stage ...]
#   stages: probe tests config5 mfu planar_dof bench configs success
#   (default: all of them EXCEPT success — that one is a CPU-bound
#   closed-loop sanity, run it explicitly if wanted)
set -u
PY=/opt/venv/bin/python
OUT=/tmp/tpu_r4
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run_stage() {
  local name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$OUT/session.log"
  timeout "${STAGE_TIMEOUT:-3600}" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%S)" | tee -a "$OUT/session.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/session.log"
}

STAGES="${*:-probe tests config5 mfu planar_dof bench configs}"

for s in $STAGES; do
  case "$s" in
    probe)
      run_stage probe $PY -c "import jax; print(jax.devices())"
      ;;
    tests)
      # hardware validation of every Pallas kernel, INCLUDING the round-3
      # stencil kernel that had never run on a chip (VERDICT r3 #2).
      # 2h cap: round-3's run was 9:38 but this round adds never-compiled
      # Mosaic shapes, and cold tunnel compiles run 90s-10+min each.
      STAGE_TIMEOUT=7200 \
      STOCH_GPMP_TPU_TESTS=1 run_stage tests $PY -m pytest \
        tests/test_fused_step_tpu.py tests/test_fused_panda_tpu.py \
        tests/test_panda_fast_tpu.py tests/test_fused_panda_dof_tpu.py \
        tests/test_pallas_fields.py -q -m ""
      ;;
    config5)
      # correct-numerics config-5 re-measurement (XLA-dof vs fused-dof A/B
      # built into the runner); generous cap for cold kernel compiles
      STAGE_TIMEOUT=5400 run_stage config5 $PY benchmarks/run.py --config 5
      ;;
    mfu)
      # the MFU/roofline table (VERDICT r3 #3, asked two rounds running)
      run_stage mfu $PY benchmarks/mfu.py
      ;;
    planar_dof)
      # d<=8 dof dense-apply vs pscan plane path (VERDICT r3 #7)
      run_stage planar_dof $PY benchmarks/long_horizon.py --planar-dof \
        --horizons 512 1024 4096
      ;;
    bench)
      run_stage bench $PY bench.py
      ;;
    configs)
      run_stage configs $PY benchmarks/run.py
      ;;
    success)
      # optional: closed-loop sanity on hardware (suite is CPU-bound)
      run_stage success env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        $PY benchmarks/success_rate_panda.py --seeds 5 --iters 300
      ;;
    *)
      echo "unknown stage: $s" ;;
  esac
done
echo "=== session done $(date -u) ===" | tee -a "$OUT/session.log"

# Deposit raw results into the repo so they survive this shell: the round
# driver commits uncommitted work at round end, so even an unattended run
# (watcher fired after the builder's turns ran out) lands in git.
if [ -f "$OUT/tests.log" ]; then
  cp "$OUT/tests.log" docs/TPU_TESTS_r04.txt
fi
mkdir -p docs/tpu_session_r04
for f in "$OUT"/*.log; do
  cp "$f" "docs/tpu_session_r04/$(basename "$f")"
done
