#!/bin/bash
cd /root/repo
while [ ! -f /tmp/hw_queue6_done ]; do sleep 30; done
rm -f /tmp/hw_pyramid_split.json
python tools/hw_pyramid_split.py >> /tmp/hw_pyramid_split2.log 2>&1
echo "QUEUE7_DONE" > /tmp/hw_queue7_done
