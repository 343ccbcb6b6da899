#!/bin/bash
# Background loop: attempt a gated scaling run every ~90s, but never while
# the foreground session is doing heavy work (mutex: /tmp/dev_busy).
cd /root/repo
while true; do
  if [ ! -f /tmp/dev_busy ]; then
    echo "=== $(date +%H:%M:%S) attempt ===" >> /tmp/scale_loop.log
    # the foreground session must not start Spark work while a gated run
    # is live (it would contaminate a phase) — publish a running flag it
    # can poll before touching the cluster
    touch /tmp/scale_running
    bash scripts/scale_attempt.sh >> /tmp/scale_loop.log 2>&1
    rm -f /tmp/scale_running
  fi
  sleep 90
done
