"""Plan serialization: save/load any plan pytree as a portable .npz.

Plans are analysis-heavy (the routed engine colors an nnz-edge multigraph
at build time — seconds for million-scale matrices, 47 s for the 12M-nnz
scale stress) and immutable; the cuSPARSE-`*_analysis` / FFTW-wisdom
answer is to build once and persist.  The reference has no analog (it
re-uploads and re-analyzes per run, matrix.h:341-395).

Covers the six single-chip plans AND the distributed / UM containers
(`RowPlanShards`, `HaloDiaShards`, `XFootShards`, `HostResidentPlan`,
`HostResidentShards`) via a recursive field walk: nested plan
dataclasses, lists of per-band plans, numpy metadata arrays and
NamedTuple stats all round-trip.  Residency state (underscore fields:
device copies, tuned stacks) is transient and intentionally NOT saved —
a loaded UM plan starts untuned, exactly like a freshly built one.

Format: one .npz holding the dataclass fields — data fields as arrays
(`a:` jax / `n:` numpy, tuples of arrays flattened with indexed keys;
nested objects use dotted/indexed key prefixes), meta fields as one JSON
blob (tuples round-trip as lists and are re-tupled on load).  No pickle
anywhere, so files are safe to share.
"""

from __future__ import annotations

import dataclasses
import io as iomod
import json
from typing import Any

import numpy as np


def _plan_registry():
    from ..memory.dist import HostResidentShards
    from ..memory.host import HostResidentPlan
    from ..ops.bsr import BsrPlan
    from ..ops.dia import DiaPlan
    from ..ops.plans import CooPlan, EllPlan
    from ..ops.rspmv import RoutedPlan
    from ..ops.wcoo import WcooPlan
    from ..parallel.planned import HaloDiaShards, RowPlanShards
    from ..parallel.xfoot import XFootShards
    return {c.__name__: c for c in
            (BsrPlan, CooPlan, DiaPlan, EllPlan, RoutedPlan, WcooPlan,
             RowPlanShards, HaloDiaShards, XFootShards,
             HostResidentPlan, HostResidentShards)}


def _namedtuple_registry():
    from ..parallel.xfoot import XFootStats
    return {c.__name__: c for c in (XFootStats,)}


def _tuplify(x: Any) -> Any:
    """JSON round-trip: lists -> tuples, recursively (schedules and shapes
    are tuples and must hash)."""
    if isinstance(x, list):
        return tuple(_tuplify(v) for v in x)
    return x


def _flatten(obj, prefix: str, arrays: dict, meta: dict,
             dtypes: dict) -> None:
    import jax

    registry = _plan_registry()
    meta[f"{prefix}__class__"] = type(obj).__name__
    for f in dataclasses.fields(obj):
        if f.name.startswith("_"):
            continue  # transient residency state; rebuilt by tuning calls
        v = getattr(obj, f.name)
        key = prefix + f.name
        if dataclasses.is_dataclass(v) and type(v).__name__ in registry:
            _flatten(v, key + ".", arrays, meta, dtypes)
        elif (isinstance(v, list) and v
              and all(dataclasses.is_dataclass(e)
                      and type(e).__name__ in registry for e in v)):
            meta[f"__list__{key}"] = len(v)
            for i, e in enumerate(v):
                _flatten(e, f"{key}[{i}].", arrays, meta, dtypes)
        elif isinstance(v, jax.Array):
            arrays[f"a:{key}"] = np.asarray(v)
            dtypes[f"a:{key}"] = str(np.asarray(v).dtype)
        elif isinstance(v, np.ndarray):
            arrays[f"n:{key}"] = v
        elif (isinstance(v, tuple) and v
              and all(isinstance(e, (jax.Array, np.ndarray))
                      for e in v)):
            for i, e in enumerate(v):
                arrays[f"t:{key}:{i}"] = np.asarray(e)
                dtypes[f"t:{key}:{i}"] = str(np.asarray(e).dtype)
            meta[f"__tuplelen__{key}"] = len(v)
        elif (isinstance(v, tuple) and hasattr(v, "_fields")
              and type(v).__name__ in _namedtuple_registry()):
            meta[key] = list(v)
            meta[f"__nt__{key}"] = type(v).__name__
        else:
            meta[key] = v


def save_plan(path: str, plan) -> None:
    """Serialize a plan / shards / UM dataclass to `path` (.npz,
    no pickle)."""
    arrays: dict = {}
    meta: dict = {}
    dtypes: dict = {}
    _flatten(plan, "", arrays, meta, dtypes)
    # intended dtypes recorded so a load in a differently-configured
    # process (e.g. x64 off) fails loudly instead of silently downcasting
    meta["__dtypes__"] = dtypes
    buf = iomod.BytesIO()
    np.savez_compressed(buf, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


def cached_plan(path: str, build, valid=None, put=None):
    """Load the plan at `path` when present and `valid(plan)` holds,
    else `build()` it and persist.  The one idiom behind every
    build-once/run-many call site (bench, drivers, experiment scripts)
    — an unusable or schema-drifted file silently falls through to a
    rebuild that overwrites it."""
    import os
    if os.path.exists(path):
        try:
            plan = load_plan(path, put=put)
            if valid is None or valid(plan):
                return plan
        except Exception:
            pass  # unreadable/drifted: rebuild below
    plan = build()
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    save_plan(path, plan)
    return plan


def load_plan(path: str, put=None):
    """Load a plan saved by `save_plan`.

    `put` places each jax data array (default: `jnp.asarray`, the default
    device); pass a pinned-host `device_put` for UM plans so bands land
    back in host DRAM instead of HBM.

    Raises FormatError when the current JAX config cannot represent a
    stored dtype (e.g. a float64 plan loaded with x64 disabled) — silent
    canonicalization would change results without any error."""
    import jax.numpy as jnp

    from ..utils.errors import FormatError

    put = put or jnp.asarray

    def _dev(key, arr, want: str):
        out = put(arr)
        if want is not None and str(out.dtype) != want:
            raise FormatError(
                f"plan cache {path}: array {key!r} was saved as {want} but "
                f"would load as {out.dtype} under the current JAX config "
                f"(enable jax_enable_x64 or re-save the plan)")
        return out

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        dtypes = meta.pop("__dtypes__", {})
        registry = _plan_registry()
        nt_registry = _namedtuple_registry()
        files = set(z.files)

        def build(prefix: str):
            cls = registry[meta[f"{prefix}__class__"]]
            kwargs = {}
            # (cls(**kwargs) below surfaces schema drift — a plan saved
            # before a dataclass gained a required field — as FormatError
            # via the wrapper at the bottom, not a raw TypeError)
            for f in dataclasses.fields(cls):
                if f.name.startswith("_"):
                    continue
                key = prefix + f.name
                if f"{key}.__class__" in meta:
                    kwargs[f.name] = build(key + ".")
                elif f"__list__{key}" in meta:
                    kwargs[f.name] = [build(f"{key}[{i}].")
                                      for i in range(meta[f"__list__{key}"])]
                elif f"a:{key}" in files:
                    kwargs[f.name] = _dev(f"a:{key}", z[f"a:{key}"],
                                          dtypes.get(f"a:{key}"))
                elif f"n:{key}" in files:
                    kwargs[f.name] = z[f"n:{key}"]
                elif f"__tuplelen__{key}" in meta:
                    kwargs[f.name] = tuple(
                        _dev(f"t:{key}:{i}", z[f"t:{key}:{i}"],
                             dtypes.get(f"t:{key}:{i}"))
                        for i in range(meta[f"__tuplelen__{key}"]))
                elif f"__nt__{key}" in meta:
                    kwargs[f.name] = nt_registry[meta[f"__nt__{key}"]](
                        *_tuplify(meta[key]))
                elif key in meta:
                    kwargs[f.name] = _tuplify(meta[key])
                # else: field with default (transient) — leave unset
            return cls(**kwargs)

        try:
            return build("")
        except (TypeError, KeyError) as e:
            # schema drift: the file predates a field change in the plan
            # dataclasses — callers should delete the cache and rebuild
            raise FormatError(
                f"plan cache {path} does not match the current plan "
                f"schema ({e}); delete it and rebuild") from e
