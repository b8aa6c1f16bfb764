#!/bin/bash
cd /root/repo
while [ ! -f /tmp/hw_queue5_done ]; do sleep 30; done
python tools/hw_jnp_ckpt_ab.py >> /tmp/hw_jnp_ckpt_ab.log 2>&1
echo "QUEUE6_DONE" > /tmp/hw_queue6_done
