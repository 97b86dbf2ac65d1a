#!/bin/bash
# Unattended post-kernel-change TPU sequence: wait for the backend to come
# back, then (1) kernel parity (tools/tpu_checks.py - MISMATCH here means
# a Mosaic lowering bug to fix before anything else), (2) re-populate the
# persistent compile cache + measure at the driver sizes, (3) the 2^24
# phase map, (4) encode decomposition, (5) kernel rooflines.
#
#   nohup tools/revalidate_tpu.sh /tmp/tpu_revalidate.log &
#
# Every step runs under timeout so a wedged tunnel can't stall the chain.
cd "$(dirname "$0")/.." || exit 1
log=${1:-/tmp/tpu_revalidate.log}
{
    date
    until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
        sleep 180
        echo "waiting for TPU backend $(date)"
    done
    echo "=== TPU up $(date)"
    echo "=== tpu_checks"
    timeout 3600 python -u tools/tpu_checks.py
    echo "rc=$?"
    for n in 20 22 24; do
        echo "=== bench pcs 2^$n"
        timeout 3600 python -u bench.py --log-n "$n"
    done
    echo "=== phase map 2^24"
    timeout 2400 python -u bench.py --phases --log-n 24
    echo "=== encode probe 2^24"
    timeout 2400 python -u tools/encode_probe.py 24
    echo "=== roofline"
    timeout 2400 python -u tools/roofline.py
    echo "=== done $(date)"
} >"$log" 2>&1
