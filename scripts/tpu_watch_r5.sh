#!/bin/bash
# Round-5 tunnel watcher: probe the axon TPU attachment every ~15 min in a
# timed subprocess (a dead tunnel hangs jax.devices() forever in-process —
# CLAUDE.md); the moment a probe succeeds, run the staged hardware agenda
# (scripts/tpu_session_r5.sh) and exit.
#
# Launch DETACHED so it survives the builder session that armed it
# (VERDICT r4 weak #5 — the round-4 watcher died with its session):
#   setsid nohup bash scripts/tpu_watch_r5.sh > /tmp/tpu_r5/watch.out 2>&1 &
#   echo $! > /tmp/tpu_r5/watch.pid
set -u
PY=/opt/venv/bin/python
OUT=/tmp/tpu_r5
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

SESSION=${SESSION:-scripts/tpu_session_r5.sh}
MAX_PROBES=${MAX_PROBES:-60}   # 60 x ~15 min ~= 15 h (covers the round)
PROBE_TIMEOUT=${PROBE_TIMEOUT:-240}
SLEEP_S=${SLEEP_S:-780}

for i in $(seq 1 "$MAX_PROBES"); do
  echo "[watch] probe $i/$MAX_PROBES $(date -u +%H:%M:%S)" | tee -a "$OUT/watch.log"
  timeout "$PROBE_TIMEOUT" "$PY" - <<'EOF' >> "$OUT/watch.log" 2>&1
import jax, jax.numpy as jnp, numpy as np
devs = jax.devices()
# live tunnel: platform may report as 'tpu' or under the plugin name
assert devs and devs[0].platform.lower() in ("tpu", "axon"), devs
# liveness = an actual round trip, not just a device listing
val = np.asarray(jnp.arange(8.0).sum())
assert val == 28.0, val
print("probe ok:", devs)
EOF
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[watch] TUNNEL LIVE at $(date -u) — running $SESSION" | tee -a "$OUT/watch.log"
    bash "$SESSION" 2>&1 | tee -a "$OUT/watch.log"
    echo "[watch] session complete $(date -u)" | tee -a "$OUT/watch.log"
    exit 0
  fi
  echo "[watch] tunnel dead (probe rc=$rc)" | tee -a "$OUT/watch.log"
  sleep "$SLEEP_S"
done
echo "[watch] gave up after $MAX_PROBES probes $(date -u)" | tee -a "$OUT/watch.log"
exit 1
