#!/bin/bash
# Round-5 second chip window: the items left queued by ACCEPTANCE_R5 plus
# the never-run one-dispatch UM probe.  SEQUENTIAL (never two JAX
# processes against the attachment), per-step timeouts, one log; probes
# for recovery happen only BETWEEN steps (a background watcher is itself
# a second JAX process and collides with the active run — CLAUDE.md).
#   bash experiments/chip_queue_r5b.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-chip_queue_r5b.log}
step() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
}

# 1. canonical verify drive (cheap health gate for the window)
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

# 2. one-dispatch UM streaming probe (spmv_um is 32.6 ms/call against a
# 12.2 ms device-compute floor — dispatch-bound; in-jit device_put hands
# the band loop to XLA's scheduler as ONE dispatch)
step um_onedispatch 2400 python experiments/um_onedispatch.py

# 3. progressive-delivery healthy-window re-confirmation (ACCEPTANCE_R5
# queued item: cold first result <10 s holds when contact is ~2 s and
# the tunnel's server-side compile cache is warm for this shape)
if [ ! -f /tmp/mtx_acceptance/webbase-1M-like.mtx ]; then
  step gen_mtx 1800 python matrices/gen_matrices.py /tmp/mtx_acceptance
fi
rm -f /tmp/mtx_acceptance/webbase_plan_r5b.npz
step cli_progressive 3000 python -m sblas_tpu.cli.spmv_test \
  /tmp/mtx_acceptance/webbase-1M-like.mtx 1.0 1.0 1 --mode single \
  --progressive --plan-cache /tmp/mtx_acceptance/webbase_plan_r5b.npz

# 4. bench capture (canonical r5 numbers for BASELINE.md)
step bench 4500 python bench.py
