"""Shared CLI driver machinery.

The reference's five test binaries share a shape: parse positional argv,
load operands, run a distributed op, verify against the CPU oracle, print
Load/Run/CPU times and `Validation = True/False` (spmm_test.cu:19-56,
spmv_test.cu:9-42).  This module factors that shape once.

Deviations (documented): process exit code reflects validation (the
reference's unit_test returns 0 unconditionally, unit_test.cu:177-187);
when fewer devices exist than requested we either clamp or, with
`SBLAS_FORCE_CPU_DEVICES=1`, build a virtual CPU mesh — the reference
simply crashes on cudaSetDevice.
"""

from __future__ import annotations

import os
import sys


def setup_devices(n_requested: int):
    """Return (mesh, n_effective).  Must run before any other jax use."""
    import jax

    if os.environ.get("SBLAS_FORCE_CPU_DEVICES") == "1":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(n_requested, 1))
    from ..parallel import make_mesh

    avail = len(jax.devices())
    n = min(n_requested, avail)
    if n != n_requested:
        print(f"[sblas] requested {n_requested} devices, have {avail}; "
              f"running on {n} (set SBLAS_FORCE_CPU_DEVICES=1 for a "
              f"virtual CPU mesh)")
    return make_mesh(n), n


def finish(ok: bool, times_ms: dict) -> int:
    """Print the reference-style report; return a process exit code."""
    for name, ms in times_ms.items():
        print(f"{name} = {ms:.3f} ms")
    print(f"Validation = {ok}")
    return 0 if ok else 1


def positional(argv, names, casts, usage: str):
    if len(argv) < len(names):
        print(usage, file=sys.stderr)
        raise SystemExit(2)
    return [cast(a) for a, cast in zip(argv, casts)]
