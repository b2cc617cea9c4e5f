#!/bin/bash
# Supervise the wide-column 50-epoch training run to completion:
# relaunch on stall (no log growth for STALL_MIN minutes) or crash,
# stop cleanly once checkpoint 50 exists.
# Usage: scripts/train_supervisor.sh [logfile]
cd /root/repo
LOG=${1:-logs/train_wide_r3d.log}
STALL_MIN=${STALL_MIN:-14}
CKPT_DIR=logs/SymNet_ColumnWide_v0/checkpoint

launch() {
  # save=all (neighbor lists + taps across the fwd/bwd boundary): the
  # best-measured remat mode with the dense-pair trunk (variant D,
  # scripts/probe_train_variants.py — 118 ms/step; save=full compiles
  # too slowly with the dense pair fields materialized per window step)
  DMCF_SAVE_SEARCHES=all nohup python run_pipeline.py \
    --cfg_file configs/column/symnet_wide.yml --split train \
    >> "$LOG" 2>&1 &
  echo $! > /tmp/train_wide.pid
  echo "supervisor: launched pid $(cat /tmp/train_wide.pid) at $(date)" >> /tmp/supervisor.log
}

stop_pid() {
  local pid=$(cat /tmp/train_wide.pid 2>/dev/null)
  [ -n "$pid" ] && kill "$pid" 2>/dev/null
  sleep 8
  [ -n "$pid" ] && kill -9 "$pid" 2>/dev/null
}

launch
last_size=0; last_change=$(date +%s)
for i in $(seq 1 2000); do
  sleep 30
  if [ -d "$CKPT_DIR/50" ]; then
    echo "supervisor: checkpoint 50 reached at $(date)" >> /tmp/supervisor.log
    sleep 60   # let the final save finalize
    stop_pid
    echo "supervisor: DONE" >> /tmp/supervisor.log
    exit 0
  fi
  pid=$(cat /tmp/train_wide.pid)
  if ! kill -0 "$pid" 2>/dev/null; then
    echo "supervisor: trainer died, relaunching at $(date)" >> /tmp/supervisor.log
    sleep 120   # give the tunnel a moment after a crash
    launch
    last_change=$(date +%s)
    continue
  fi
  size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  now=$(date +%s)
  if [ "$size" != "$last_size" ]; then
    last_size=$size; last_change=$now
  elif [ $((now - last_change)) -gt $((STALL_MIN * 60)) ]; then
    echo "supervisor: stall (${STALL_MIN}m no log growth), restarting at $(date)" >> /tmp/supervisor.log
    stop_pid
    sleep 240   # post-kill tunnel wedge window
    launch
    last_change=$(date +%s)
  fi
done
echo "supervisor: loop budget exhausted at $(date)" >> /tmp/supervisor.log
