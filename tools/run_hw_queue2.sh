#!/bin/bash
# Stage-2 hardware queue: perf experiments, after run_hw_queue.sh finishes.
cd /root/repo
while [ ! -f /tmp/hw_queue_done ]; do sleep 20; done
python tools/hw_dispatch_floor.py >> /tmp/hw_dispatch_floor.log 2>&1
python tools/hw_stacked_uv_ab.py >> /tmp/hw_stacked_uv_ab.log 2>&1
python tools/hw_fused_s32.py >> /tmp/hw_fused_s32.log 2>&1
echo "QUEUE2_DONE" > /tmp/hw_queue2_done
