#!/bin/bash
# Round-4 hardware queue (serial remote-compile helper: one job at a time).
# Launch AFTER tools/hw_skewed_ab.py's "skewed" leg finishes:
#   nohup bash tools/run_hw_queue3.sh > /tmp/hw_queue3.log 2>&1 &
cd /root/repo
python tools/hw_skewed_ab.py fused >> /tmp/hw_skewed.log 2>&1
python tools/hw_pyramid_split.py >> /tmp/hw_pyramid_split.log 2>&1
python tools/hw_resident_batched.py >> /tmp/hw_resident_batched.log 2>&1
python tools/hw_family_table.py >> /tmp/hw_family_table.log 2>&1
python tools/hw_results_regen.py >> /tmp/hw_results_regen.log 2>&1
echo "QUEUE3_DONE" > /tmp/hw_queue3_done
