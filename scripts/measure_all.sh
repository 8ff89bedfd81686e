#!/bin/bash
# One-shot device measurement battery (run alone on a healthy TPU).
#
# Covers every round-3 pending measurement: the flips-in-gather training
# A/B, the Mosaic kernel micros (int8 s1/s2/up + bf16 s1, incl. the
# flattened-M variants), the composed int8 and float A/Bs (device-
# timeline arbiter, DESIGN.md par.16), and bench.py. Sequential — never
# run two TPU processes at once (CLAUDE.md). Check tunnel health FIRST:
#   python3 -c "import socket; socket.create_connection(('127.0.0.1',8082),2)"
# (connection refused = host-side relay dead; only external recovery helps).
#
# Decision rules (memory + DESIGN par.20): flip kernel defaults ON only
# if the composed A/B wins on the device timeline AND the bit-exact arms
# match on hardware; otherwise record the negative with numbers.
cd "$(dirname "$0")/.."
LOG=${MEASURE_LOG:-/tmp/measure_all.log}
echo "=== measurement battery started $(date) ===" >> "$LOG"

run() {
  name=$1; shift
  echo "--- $name: $(date) ---" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- $name exit=$? $(date) ---" >> "$LOG"
  sleep 5
}

run sanity python -u -c "
import jax, jax.numpy as jnp
y=(jnp.ones((1024,1024),jnp.bfloat16)@jnp.ones((1024,1024),jnp.bfloat16)).sum()
print('sanity OK', float(y.astype(jnp.float32)))"

run flip_ab      python -u scripts/ab_flip_gather.py
run mosaic_micro python -u scripts/probe_mosaic_int8.py
run mosaic_ab    python -u scripts/ab_mosaic_int8.py
run mosaic_float python -u scripts/ab_mosaic_float.py
run bench        python -u bench.py
# round-3 session-6 regression canaries (DESIGN.md par.22-25): the
# non-power-of-two canvas (count-bump + device-pad paths), the measured
# plan autotuner, and the head-dot A/B guard
run bench_3000   python -u bench.py --image-size 3000
run bench_tuned  python -u bench.py --plan-autotune
run head_ab      env ANNONET_TPU_HEAD_DOT=0 python -u bench.py
run plan_counts  python -u scripts/probe_plan_counts.py --size 3000 --counts 3 3 4 4

echo "=== battery done $(date) ===" >> "$LOG"
