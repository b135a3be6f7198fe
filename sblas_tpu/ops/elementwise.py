"""Elementwise utility ops.

Parity with the reference's hand-written CUDA kernels in kernel.h:
* `axpby` <- `denseVector_plusEqual_denseVector` (kernel.h:27-38,
  `Y = beta*Y + alpha*X`, used by plusDenseMatrixGPU/plusDenseVectorGPU);
* `plus_scalar` <- `denseVector_plusEqual_scalar` (kernel.h:18-25 — note the
  reference version has a thread-indexing bug, `blockIdx.x*gridDim.x`, and is
  unused; ours is correct).

Under XLA these are trivially fused into neighbors; they exist standalone for
API parity and for host-driven epilogues.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def axpby(x: jax.Array, y: jax.Array, alpha, beta) -> jax.Array:
    """Return beta*y + alpha*x (reference kernel.h:27-38 semantics)."""
    return beta * y + alpha * x


@jax.jit
def plus_scalar(y: jax.Array, value) -> jax.Array:
    """Return y + value (corrected reference kernel.h:18-25)."""
    return y + jnp.asarray(value, dtype=y.dtype)
