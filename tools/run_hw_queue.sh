#!/bin/bash
# Drain the round-2 hardware-validation queue through the serial compile
# helper: wait for any already-running A/B, then run each leg in order.
# Logs land in /tmp/hw_*.log; "DONE" on the last line marks a finished leg.
cd /root/repo
WAIT_PID="$1"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
python tools/hw_tol_ab.py >> /tmp/hw_tol_ab.log 2>&1
python tools/hw_round2_features.py >> /tmp/hw_round2_features.log 2>&1
echo "QUEUE_DONE" > /tmp/hw_queue_done
