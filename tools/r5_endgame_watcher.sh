#!/bin/bash
# Round-5 endgame sequencer. Launched detached alongside the in-flight
# 4x scaling run (healthy_window_runner, state marks bench+skew done).
# When that runner exits, this relaunches it for the two remaining
# machine-gated evidence items, in order:
#   bench — one certified-healthy bench.py lineage record (r4 verdict
#           item 2; the step now refuses controls_healthy=false runs)
#   skew  — SKEW_QUERIES=seqbuild: the ordered-collect skew family only
#           (r4 verdict item 6; per-family fences, ~3-minute window)
# If the first runner died WITHOUT finishing scaling, scaling stays in
# the pending list so the relaunch retries it after bench+skew (those
# two fit short healthy windows; scaling needs a ~40-minute one).
set -u
cd "$(dirname "$0")/.."
STATE=BENCH/healthy_runner_state.json

while pgrep -f "python.*healthy_window_runner" >/dev/null 2>&1; do
  sleep 60
done

if grep -q '"scaling"' "$STATE" 2>/dev/null; then
  echo '{"done": ["scaling"]}' > "$STATE"
else
  echo '{"done": []}' > "$STATE"
fi
echo "[watcher] runner exited; relaunching for bench+skew(seqbuild) at $(date -u +%H:%M:%S)" >> BENCH/healthy_runner.log

HEALTH_STREAK=1 HEALTH_PROBE_SLEEP=120 SKEW_QUERIES=seqbuild \
  nohup python tools/healthy_window_runner.py >> BENCH/healthy_runner.log 2>&1 &
