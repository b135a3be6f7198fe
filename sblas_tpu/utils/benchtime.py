"""Device-accurate kernel timing through an async dispatch tunnel.

The axon TPU attachment dispatches asynchronously and `block_until_ready`
returns before device completion, with a ~1.2 ms per-dispatch overhead —
naive wall-clock timing measures the tunnel, not the kernel (the analog of
timing CUDA without cudaEventSynchronize).  Strategy:

1. run K iterations of the op inside ONE jitted `lax.fori_loop` (single
   dispatch, K devices-side executions);
2. thread the carry through the op's *inputs* (not just the epilogue) so
   XLA cannot hoist the loop-invariant hot computation out of the loop;
3. synchronize by fetching a scalar reduction to host (a real data
   dependency), and amortize: per-iter = (t_loop(K) - t_dispatch) / K.

`loop_time_ms` is the framework's `gpu_timer` equivalent
(reference utility.h:163-178, cudaEvent pair).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _sync(x) -> None:
    """Force device completion via a scalar host fetch."""
    np.asarray(jnp.sum(x))


@partial(jax.jit, static_argnames=("step", "iters"))
def _looped(carry, step, iters: int, *args):
    return lax.fori_loop(0, iters, lambda i, c: step(c, *args), carry)


_OVERHEAD_MS = None


def dispatch_overhead_ms(n: int = 10) -> float:
    """Median cost of one null dispatch+sync round trip (measured once per
    process — it is a property of the attachment, ~30 ms here, and the 10
    synchronized round trips cost ~0.3 s each time)."""
    global _OVERHEAD_MS
    if _OVERHEAD_MS is not None:
        return _OVERHEAD_MS
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    _sync(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    _OVERHEAD_MS = float(np.median(ts))
    return _OVERHEAD_MS


def loop_time_ms(step, init_carry, iters: int = 32, reps: int = 5,
                 args: tuple = ()) -> float:
    """Median per-iteration device time of `step` (carry[, *args] -> carry).

    `step` must consume its carry in the hot path (see module docstring);
    it is hashed as a static jit argument, so pass a module-level function
    or a stable closure.  Pass LARGE operands (plans!) through `args`, not
    closure capture: captured arrays are embedded as HLO constants and the
    remote-compile tunnel rejects big request bodies (HTTP 413 observed at
    a few hundred MB of route tables)."""
    overhead = dispatch_overhead_ms()
    _sync(_looped(init_carry, step, iters, *args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(_looped(init_carry, step, iters, *args))
        ts.append((time.perf_counter() - t0) * 1e3)
    # min over reps (each rep already averages `iters` device executions):
    # the standard low-noise estimator — this host's shared TPU attachment
    # shows up to ~40% run-to-run contention on the median
    total = float(np.min(ts))
    return max(total - overhead, 1e-6) / iters


def loop_time2_ms(step, init_carry, iters: int = 2048, reps: int = 5,
                  args: tuple = ()) -> float:
    """Two-point variant of `loop_time_ms` for MICROSECOND-scale stages.

    per-iter = (min t(2K) - min t(K)) / K: the dispatch constant cancels
    per run instead of being subtracted as a separately-measured median,
    which matters when K*stage is comparable to the ~±5 ms dispatch
    noise — the r4 shard decompose measured 19 us stages as 0.0 with the
    one-point estimator (256 x 19 us = 4.9 ms of signal against a 26-36 ms
    constant that varies per process).  Default iters=2048 puts a 19 us
    stage at ~39 ms of signal.  Costs ~3x the loop executions."""
    _sync(_looped(init_carry, step, iters, *args))      # compile + warm K
    _sync(_looped(init_carry, step, 2 * iters, *args))  # compile + warm 2K
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(_looped(init_carry, step, iters, *args))
        t1s.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        _sync(_looped(init_carry, step, 2 * iters, *args))
        t2s.append((time.perf_counter() - t0) * 1e3)
    return max(float(np.min(t2s)) - float(np.min(t1s)), 1e-6) / iters
