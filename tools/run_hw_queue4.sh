#!/bin/bash
# Round-4 stage-2 queue: runs after run_hw_queue3.sh completes.
cd /root/repo
while [ ! -f /tmp/hw_queue3_done ]; do sleep 30; done
rm -f /tmp/hw_pyramid_resident.json
python tools/hw_pyramid_resident.py resident >> /tmp/hw_pyr_res2.log 2>&1
python bench.py >> /tmp/bench_r4.log 2>&1
echo "QUEUE4_DONE" > /tmp/hw_queue4_done
