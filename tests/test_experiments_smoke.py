"""Chip-window experiment scripts: wiring smoke on the CPU mesh.

The scripts under `experiments/` are the round's queued on-chip
measurements; an ImportError, stale attribute, or cache-path bug in one
of them would only surface on the real chip and burn an attachment
window (the round-3/4 outages made those windows scarce).  Each main()
runs end to end here at toy scale in a temp cwd (so `.bench_cache`
writes are isolated), with the workload generators and the loop timer
patched down — asserting rc == 0 and that every script still speaks the
current library API.  Numbers produced here are meaningless by design.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

_EXP = os.path.join(os.path.dirname(__file__), "..", "experiments")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"exp_{name}", os.path.join(_EXP, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def toy_world(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    import sblas_tpu.io.generate as gen
    real_web = gen.webbase_like

    def small_web(*a, **kw):
        return real_web(n=4096, avg_deg=3.0, seed=3, local_scale=60.0,
                        dtype=kw.get("dtype", np.float32))

    monkeypatch.setattr(gen, "webbase_like", small_web)
    import sblas_tpu.utils.benchtime as bt
    real_loop = bt.loop_time_ms

    def fast_loop(step, carry, iters=2, reps=1, args=()):
        return real_loop(step, carry, iters=2, reps=1, args=args)

    monkeypatch.setattr(bt, "loop_time_ms", fast_loop)
    # the sweep script mutates this env var; let pytest restore it
    monkeypatch.setenv("SBLAS_STREAM_CHUNK", "1")
    return monkeypatch


def test_shard_decompose(toy_world, capsys):
    mod = _load("shard_decompose")
    toy_world.setattr(sys, "argv", ["shard_decompose.py", "2"])
    assert mod.main() == 0
    out = capsys.readouterr().out
    assert "mainroute" in out and "segsum" in out


def test_stream_chunk_sweep(toy_world, capsys):
    mod = _load("stream_chunk_sweep")
    assert mod.main() == 0
    out = capsys.readouterr().out
    assert out.count("chunk=") == 4


def test_wcoo_gather_probe(toy_world, capsys):
    mod = _load("wcoo_gather_probe")
    assert mod.main() == 0
    out = capsys.readouterr().out
    assert "pallas gather oracle: OK" in out
    assert "go/no-go" in out


def test_bf16_transport_probe(toy_world, capsys):
    mod = _load("bf16_transport_probe")
    assert mod.main() == 0
    out = capsys.readouterr().out
    assert "bf16 transport speedup" in out


def test_stress4m(toy_world, capsys):
    mod = _load("stress4m")
    assert mod.main() == 0
    out = capsys.readouterr().out
    assert "oracle[0:64] max_rel" in out and "routed SpMV" in out
