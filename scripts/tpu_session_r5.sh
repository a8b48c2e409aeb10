#!/bin/bash
# Round-5 hardware agenda (VERDICT r4 #1-#4), run sequentially the moment
# the TPU tunnel is live (ONE TPU process at a time — single tunneled
# chip). Each stage logs to /tmp/tpu_r5/; a failure does not stop later
# stages. At the end the script deposits BOTH raw logs and a parsed
# results fragment (docs/tpu_session_r05/results.md) into the repo, so an
# unattended watcher-fired run leaves numbers in documents, not just logs
# (VERDICT r4 #5) — the round driver commits uncommitted work at round end.
#
# Usage: bash scripts/tpu_session_r5.sh [stage ...]
#   stages: probe tests config5 config4 mfu planar_dof bench configs success
#   (default: all EXCEPT success — that one is CPU-bound, run explicitly)
set -u
PY=/opt/venv/bin/python
OUT=/tmp/tpu_r5
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run_stage() {
  local name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$OUT/session.log"
  timeout "${STAGE_TIMEOUT:-3600}" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%S)" | tee -a "$OUT/session.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/session.log"
  deposit  # incrementally: a round ending mid-session still lands numbers
}

# ---- Deposit results into the repo (survives an unattended run). Called
# after EVERY stage: the round driver commits whatever is in the worktree at
# round end, so even a session interrupted mid-stage leaves the completed
# stages' numbers in git.
deposit() {
  mkdir -p docs/tpu_session_r05
  if [ -f "$OUT/tests.log" ]; then
    cp "$OUT/tests.log" docs/TPU_TESTS_r05.txt
  fi
  for f in "$OUT"/*.log; do
    cp "$f" "docs/tpu_session_r05/$(basename "$f")"
  done
  # Parsed fragment: every benchmark in this repo prints one JSON object per
  # result line, so the numbers are extracted mechanically — a future round
  # (or the judge) reads this file, not raw logs.
  local RES=docs/tpu_session_r05/results.md
  {
    echo "# Round-5 TPU session results ($(date -u +%Y-%m-%dT%H:%MZ))"
    echo
    echo "Raw logs alongside this file; stages run one at a time (on the"
    echo "single tunneled v5e chip when live — a per-line \"note\" field marks"
    echo "any CPU fallback). JSON result lines extracted per stage:"
    for name in config5 config4 mfu planar_dof bench configs; do
      [ -f "$OUT/$name.log" ] || continue
      echo
      echo "## $name"
      echo '```json'
      grep '^{' "$OUT/$name.log" || echo "(no JSON result lines — see $name.log)"
      echo '```'
    done
    if [ -f "$OUT/tests.log" ]; then
      echo
      echo "## tests (TPU-gated kernel suite)"
      echo '```'
      tail -5 "$OUT/tests.log"
      echo '```'
    fi
  } > "$RES"
}

STAGES="${*:-probe tests config5 config4 mfu planar_dof bench configs}"

for s in $STAGES; do
  case "$s" in
    probe)
      run_stage probe $PY -c "import jax; print(jax.devices())"
      ;;
    tests)
      # hardware validation of every Pallas kernel, INCLUDING the
      # round-3/4 stencil kernel's FIRST-EVER chip run (VERDICT r4 #1).
      # 2h cap: cold tunnel compiles run 90s-10+min per new Mosaic shape.
      STAGE_TIMEOUT=7200 \
      STOCH_GPMP_TPU_TESTS=1 run_stage tests $PY -m pytest \
        tests/test_fused_step_tpu.py tests/test_fused_panda_tpu.py \
        tests/test_panda_fast_tpu.py tests/test_fused_panda_dof_tpu.py \
        tests/test_pallas_fields.py -q -m ""
      ;;
    config5)
      # correct-numerics config-5 re-measurement (XLA-dof vs fused-dof
      # A/B built into the runner); generous cap for cold kernel compiles
      STAGE_TIMEOUT=5400 run_stage config5 $PY benchmarks/run.py --config 5
      ;;
    config4)
      # config-4's 142k headline was measured pre-stencil with the
      # bf16-corrupted dense quadratic (VERDICT r4 weak #2); this is the
      # first measurement of the stencil-gated path users actually get.
      STAGE_TIMEOUT=5400 run_stage config4 $PY benchmarks/run.py --config 4
      ;;
    mfu)
      # the MFU/roofline table (asked since VERDICT r2)
      STAGE_TIMEOUT=5400 run_stage mfu $PY benchmarks/mfu.py
      ;;
    planar_dof)
      # d<=8 dof dense-apply vs pscan plane path A/B (VERDICT r4 #4)
      STAGE_TIMEOUT=5400 run_stage planar_dof $PY benchmarks/long_horizon.py \
        --planar-dof --horizons 512 1024 4096
      ;;
    bench)
      run_stage bench $PY bench.py
      ;;
    configs)
      STAGE_TIMEOUT=7200 run_stage configs $PY benchmarks/run.py
      ;;
    success)
      # optional: closed-loop sanity (suite is CPU-bound)
      run_stage success env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        $PY benchmarks/success_rate_panda.py --seeds 5 --iters 300
      ;;
    *)
      echo "unknown stage: $s" ;;
  esac
done
echo "=== session done $(date -u) ===" | tee -a "$OUT/session.log"
deposit
echo "results fragment written: docs/tpu_session_r05/results.md" | tee -a "$OUT/session.log"

# Idempotent pointer so BASELINE.md is self-consistent even when this
# session ran unattended (nobody transcribed the new rows yet).
if ! grep -q "tpu_session_r05/results.md" BASELINE.md; then
  cat >> BASELINE.md <<'EOF'

**Round-5 hardware session (unattended-capable).** The authoritative round-5
measurements — config-5 and config-4 correct-numerics numbers, the MFU table,
the d<=8 planar-dof A/B, and the stencil kernel's first chip run — are
deposited stage-by-stage in `docs/tpu_session_r05/results.md` (+ raw logs
alongside). If a row above disagrees with that file, the session file wins;
rows are transcribed up here when a builder session is active.
EOF
fi
