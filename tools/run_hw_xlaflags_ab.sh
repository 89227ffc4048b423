#!/bin/bash
# DEAD END — kept as the negative result (logs/xlaflags_ab_r3.log):
# client-set XLA_FLAGS abort the process at env-parse time here
# ("Unknown flag in XLA_FLAGS: --xla_tpu_scoped_vmem_limit_kib") because
# the LOCAL plugin's flag table has no TPU compiler flags; the env never
# reaches the remote axon compiler. The working route is per-compile
# `compiler_options` on the AOT path — see tools/probe_compiler_options.py.
#
# Target (still valid): the trace decomposition puts 45.5 ms of the 69 ms
# step in XLA matmul fusions at ~75% MXU efficiency; the scoped-VMEM limit
# bounds the tile sizes XLA's fusion planner may pick, so raising it is
# the one documented knob aimed exactly at that headroom.
set -u
cd "$(dirname "$0")/.."
ITERS=${ITERS:-30}

run() {
  local tag="$1"; shift
  local flags="$1"; shift
  echo "=== $tag XLA_FLAGS=[$flags] ==="
  XLA_FLAGS="$flags" python tools/perf_probe.py --variants base --iters "$ITERS" 2>&1 \
    | grep -v -E "WARNING|INFO|WARN" | tail -8
}

run base ""
run vmem32m "--xla_tpu_scoped_vmem_limit_kib=32768"
run vmem64m "--xla_tpu_scoped_vmem_limit_kib=65536"
run vmem96m "--xla_tpu_scoped_vmem_limit_kib=98304"
echo "=== done ==="
