#!/bin/bash
# Round-5 chip-window queue: outstanding on-chip measurements in
# VERDICT-priority order, SEQUENTIAL (never two JAX processes against
# the attachment), per-step timeouts, one log.  Every step is either
# cheap or resumable, so a short recovery window still captures the
# most important items first.
#   bash experiments/chip_queue_r5.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-chip_queue_r5.log}
step() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
}

# 1. /verify canonical drive (ash85 SpMV on the chip)
step verify 600 python -c "
import numpy as np, jax.numpy as jnp, jax
from sblas_tpu import CsrMatrix, DenseVector, check_equal
from sblas_tpu.ops import make_plan, spmv
from sblas_tpu.ops.cpu_reference import spmv_cpu
A = CsrMatrix.from_mtx('/root/reference/ash85.mtx', dtype=np.float32)
x = DenseVector.random(A.width, dtype=np.float32)
y = DenseVector.constant(A.height, 1.0, dtype=np.float32)
out = spmv(make_plan(A), jnp.asarray(x.values), 3.0, 4.0,
           jnp.asarray(y.values))
print(check_equal(np.asarray(out), spmv_cpu(A, x, 3.0, 4.0, y)),
      out.device)
"

# 2. scaling-constant calibration (fast; feeds the scorecard provenance
# line for every later bench capture — VERDICT next#6)
step calibrate 1800 python experiments/calibrate_scaling.py

# 3. stage-fusion probe on the n=16 red cell (bounded experiment;
# VERDICT next#3 — either <=60 us or the fifth recorded rejection)
step stage_fuse 2400 python experiments/stage_fuse_probe.py 16

# 4. progressive-delivery chip confirmation at file scale (VERDICT
# next#2: validated first result <10 s cold at 1M rows)
if [ ! -f /tmp/mtx_acceptance/webbase-1M-like.mtx ]; then
  step gen_mtx 1800 python matrices/gen_matrices.py /tmp/mtx_acceptance
fi
rm -f /tmp/mtx_acceptance/webbase_plan_r5.npz
step cli_progressive 3000 python -m sblas_tpu.cli.spmv_test \
  /tmp/mtx_acceptance/webbase-1M-like.mtx 1.0 1.0 1 --mode single \
  --progressive --plan-cache /tmp/mtx_acceptance/webbase_plan_r5.npz

# 5. bench with the repeatability contract (BENCH_r05 preview;
# VERDICT next#7 — three repeats, spread in the JSON line)
step bench 4500 python bench.py

# 6. plan-selection robustness matrix (LONG; resumable via
# plan_matrix_results.jsonl — safe to rerun after a drop)
step plan_matrix 10000 python experiments/plan_matrix.py
step plan_report 120 python experiments/plan_matrix.py --report
