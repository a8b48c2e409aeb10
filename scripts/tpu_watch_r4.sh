#!/bin/bash
# Round-4 tunnel watcher: probe the axon TPU attachment every ~15 min in a
# timed subprocess (a dead tunnel hangs jax.devices() forever in-process —
# CLAUDE.md); the moment a probe succeeds, run the full staged hardware
# agenda (scripts/tpu_session_r4.sh) and exit. Bounded at ~11.5 h.
#
# Usage: bash scripts/tpu_watch_r4.sh   (run in background; logs to /tmp/tpu_r4/)
set -u
PY=/opt/venv/bin/python
OUT=/tmp/tpu_r4
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

MAX_PROBES=${MAX_PROBES:-46}   # 46 x ~15 min ~= 11.5 h
PROBE_TIMEOUT=${PROBE_TIMEOUT:-240}
SLEEP_S=${SLEEP_S:-780}

for i in $(seq 1 "$MAX_PROBES"); do
  echo "[watch] probe $i/$MAX_PROBES $(date -u +%H:%M:%S)" | tee -a "$OUT/watch.log"
  if timeout "$PROBE_TIMEOUT" "$PY" - <<'EOF' >> "$OUT/watch.log" 2>&1
import jax, jax.numpy as jnp, numpy as np
devs = jax.devices()
# live tunnel: platform may report as 'tpu' or under the plugin name
assert devs and devs[0].platform.lower() in ("tpu", "axon"), devs
# liveness = an actual round trip, not just a device listing
val = np.asarray(jnp.arange(8.0).sum())
assert val == 28.0, val
print("probe ok:", devs)
EOF
  then
    echo "[watch] TUNNEL LIVE at $(date -u) — running tpu_session_r4.sh" | tee -a "$OUT/watch.log"
    bash scripts/tpu_session_r4.sh 2>&1 | tee -a "$OUT/watch.log"
    echo "[watch] session complete $(date -u)" | tee -a "$OUT/watch.log"
    exit 0
  fi
  echo "[watch] tunnel dead (probe rc=$?)" | tee -a "$OUT/watch.log"
  sleep "$SLEEP_S"
done
echo "[watch] gave up after $MAX_PROBES probes $(date -u)" | tee -a "$OUT/watch.log"
exit 1
