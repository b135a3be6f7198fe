#!/bin/bash
# Round-4 chip-window queue (ACCEPTANCE_R4.md): runs the outstanding
# on-chip measurements SEQUENTIALLY (never two JAX processes against the
# attachment) with per-step timeouts, appending everything to one log.
# Usage:  bash experiments/chip_queue.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-chip_queue_r4.log}
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

# 2. headline bench (BENCH_r04 preview; the driver reruns it at round end)
step bench 3000 python bench.py

# Ordered by VERDICT priority so a SHORT recovery window captures
# the most important measurements first.

# 4. per-stage decomposition of the strong-scaling fixed cost
step shard_decompose 3000 python experiments/shard_decompose.py 16 4

# 5. wcoo gather probe (+ bf16 byte-bound variant)
step wcoo_gather 3000 python experiments/wcoo_gather_probe.py

# 5b. bf16 route transport: Mosaic compile check + route-pass timing on
# the cached webbase plan (execution-only knob; no plan rebuild)
step bf16_transport 3000 python experiments/bf16_transport_probe.py

# 7. compiled wcoo-spmm shard_map execution with check_vma=True — closes
# the vma verdict item on real hardware (single-process TPU run; tiny)
step wcoo_vma 1200 python -c "
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from sblas_tpu.io.generate import webbase_like
from sblas_tpu.parallel.planned import partition_row_plans, _unstack, \
    _local_spmm
from sblas_tpu.parallel.mesh import make_mesh, vma_check_ok
assert jax.default_backend() == 'tpu', jax.default_backend()
A = webbase_like(n=4096, avg_deg=3.0, seed=1, dtype=np.float32)
n_dev = len(jax.devices())  # 1 chip: a 1-device mesh still typechecks
shards = partition_row_plans(A, n_dev, dtype=jnp.float32, kind='wcoo')
mesh = make_mesh(n_dev)
B = jnp.ones((A.shape[1], 16), jnp.float32)
def fn(sh, Bv):
    return _local_spmm('wcoo', _unstack(sh.plan), Bv)
prog = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(P('shards'), P()),
                             out_specs=P('shards', None),
                             check_vma=vma_check_ok('wcoo')))
out = prog(shards, B)
print('vma_check_ok(wcoo) =', vma_check_ok('wcoo'),
      'compiled+ran, out', out.shape, float(out.sum()))
"

# 6. file-scale CLI acceptance (Load / plan cold / plan cached / run)
if [ -f /tmp/mtx_acceptance/webbase-1M-like.mtx ]; then
  step cli_cold 3000 python -m sblas_tpu.cli.spmv_test \
    /tmp/mtx_acceptance/webbase-1M-like.mtx 1.0 1.0 1 --mode single \
    --plan-cache /tmp/mtx_acceptance/webbase_plan.npz
  step cli_cached 1200 python -m sblas_tpu.cli.spmv_test \
    /tmp/mtx_acceptance/webbase-1M-like.mtx 1.0 1.0 1 --mode single \
    --plan-cache /tmp/mtx_acceptance/webbase_plan.npz
else
  echo "(cli step skipped: run matrices/gen_matrices.py /tmp/mtx_acceptance first)" | tee -a "$LOG"
fi

# 3. UM stream-chunk sweep (sets the measured SBLAS_STREAM_CHUNK default)
step stream_chunk 3000 python experiments/stream_chunk_sweep.py

# 5c. 4M cached-plan scale stress (r3 outage queue: re-run + chip-side
# cached reload time; oracle-gated on a row slice)
step stress4m 3000 python experiments/stress4m.py

# 8. solver layer on the chip: the fused while_loop solve vs the
# host-stepped loop (the attachment serializes deep ASYNC chains badly,
# but one while_loop program is the loop_time_ms pattern — verify +
# time both on a real workload)
step solvers 1800 python -c "
import time
import numpy as np, jax, jax.numpy as jnp
from sblas_tpu.containers import CooMatrix
from sblas_tpu.io.generate import webbase_like
from sblas_tpu.ops import make_plan, spmv
from sblas_tpu.solvers import pagerank
G = webbase_like(n=100_000, avg_deg=3.1, local_scale=2000.0)
n = G.shape[0]
coo = G.to_coo()
outdeg = np.maximum(G.row_nnz, 1).astype(np.float64)
PT = CooMatrix(coo.col_idx, coo.row_idx,
               (1.0 / outdeg[coo.row_idx]).astype(np.float32),
               (n, n)).to_csr()
dang = jnp.asarray((G.row_nnz == 0).astype(np.float32))
plan = make_plan(PT, dtype=jnp.float32, op='spmv')
t0 = time.time()
res = pagerank(plan, n, dangling=dang, damping=0.85, tol=1e-8,
               maxiter=200)
t_fused = time.time() - t0
print(f'fused pagerank: {res.iterations} iters {t_fused:.2f}s '
      f'converged={res.converged} sum={float(res.x.sum()):.6f}')
# host-stepped twin for comparison (the examples/ pattern)
a = 0.85
@jax.jit
def step(r, p):
    spread = spmv(p, r, 1.0, 0.0, jnp.zeros_like(r))
    mass = jnp.vdot(dang, r)
    rn = a * (spread + mass / n) + (1.0 - a) / n
    return rn, jnp.abs(rn - r).sum()
r = jnp.full(n, 1.0 / n, jnp.float32)
step(r, plan)  # compile
t0 = time.time()
it, delta = 0, 1.0
while it < 200 and delta > 1e-8:
    r, d = step(r, plan)
    it += 1
    delta = float(d)
print(f'host-stepped:   {it} iters {time.time()-t0:.2f}s '
      f'delta={delta:.2e}')
rel = float(jnp.abs(res.x - r).sum())
print(f'L1 diff fused vs stepped: {rel:.2e}')
"

echo "queue complete: see $LOG"
