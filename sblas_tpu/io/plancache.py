"""Plan serialization: save/load any plan pytree as a portable .npz.

Plans are analysis-heavy (the routed engine colors an nnz-edge multigraph
at build time — seconds for million-scale matrices) and immutable; the
cuSPARSE-`*_analysis` / FFTW-wisdom answer is to build once and persist.
The reference has no analog (it re-uploads and re-analyzes per run,
matrix.h:341-395).

Format: one .npz holding the plan's registered-dataclass fields —
data fields as arrays (tuples of arrays flattened with indexed keys),
meta fields as one JSON blob (tuples round-trip as lists and are
re-tupled on load).  No pickle anywhere, so files are safe to share.
"""

from __future__ import annotations

import dataclasses
import io as iomod
import json
from typing import Any

import numpy as np


def _plan_registry():
    from ..ops.bsr import BsrPlan
    from ..ops.dia import DiaPlan
    from ..ops.plans import CooPlan, EllPlan
    from ..ops.rspmv import RoutedPlan
    from ..ops.wcoo import WcooPlan
    return {c.__name__: c for c in
            (BsrPlan, CooPlan, DiaPlan, EllPlan, RoutedPlan, WcooPlan)}


def _tuplify(x: Any) -> Any:
    """JSON round-trip: lists -> tuples, recursively (schedules and shapes
    are tuples and must hash)."""
    if isinstance(x, list):
        return tuple(_tuplify(v) for v in x)
    return x


def save_plan(path: str, plan) -> None:
    """Serialize a plan dataclass to `path` (.npz, no pickle)."""
    import jax

    cls = type(plan)
    arrays = {}
    meta = {"__class__": cls.__name__}
    dtypes = {}
    for f in dataclasses.fields(plan):
        v = getattr(plan, f.name)
        if isinstance(v, (jax.Array, np.ndarray)):
            arrays[f"a:{f.name}"] = np.asarray(v)
            dtypes[f"a:{f.name}"] = str(np.asarray(v).dtype)
        elif (isinstance(v, tuple) and v
              and all(isinstance(e, (jax.Array, np.ndarray)) for e in v)):
            for i, e in enumerate(v):
                arrays[f"t:{f.name}:{i}"] = np.asarray(e)
                dtypes[f"t:{f.name}:{i}"] = str(np.asarray(e).dtype)
            meta[f"__tuplelen__{f.name}"] = len(v)
        else:
            meta[f.name] = v
    # intended dtypes recorded so a load in a differently-configured
    # process (e.g. x64 off) fails loudly instead of silently downcasting
    meta["__dtypes__"] = dtypes
    buf = iomod.BytesIO()
    np.savez_compressed(buf, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


def load_plan(path: str):
    """Load a plan saved by `save_plan`; arrays land on the default
    device.

    Raises FormatError when the current JAX config cannot represent a
    stored dtype (e.g. a float64 plan loaded with x64 disabled) — silent
    canonicalization would change results without any error."""
    import jax.numpy as jnp

    from ..utils.errors import FormatError

    def _dev(key, arr, want: str):
        out = jnp.asarray(arr)
        if want is not None and str(out.dtype) != want:
            raise FormatError(
                f"plan cache {path}: array {key!r} was saved as {want} but "
                f"would load as {out.dtype} under the current JAX config "
                f"(enable jax_enable_x64 or re-save the plan)")
        return out

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        cls = _plan_registry()[meta.pop("__class__")]
        dtypes = meta.pop("__dtypes__", {})
        kwargs = {}
        tuple_lens = {k[len("__tuplelen__"):]: meta.pop(k)
                      for k in list(meta) if k.startswith("__tuplelen__")}
        for name, v in meta.items():
            kwargs[name] = _tuplify(v)
        for key in z.files:
            if key.startswith("a:"):
                kwargs[key[2:]] = _dev(key, z[key], dtypes.get(key))
        for name, ln in tuple_lens.items():
            kwargs[name] = tuple(
                _dev(f"t:{name}:{i}", z[f"t:{name}:{i}"],
                     dtypes.get(f"t:{name}:{i}")) for i in range(ln))
    return cls(**kwargs)
