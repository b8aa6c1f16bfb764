#!/bin/bash
# Round-4 stage-3 queue: after run_hw_queue4.sh.
cd /root/repo
while [ ! -f /tmp/hw_queue4_done ]; do sleep 30; done
python tools/hw_skewed_batched.py skewed >> /tmp/hw_skewed_batched.log 2>&1
python tools/hw_skewed_batched.py banded >> /tmp/hw_skewed_batched.log 2>&1
echo "QUEUE5_DONE" > /tmp/hw_queue5_done
