"""Result verification against the CPU oracle.

Reproduces the reference's `check_equal` (utility.h:182-193): elementwise
absolute tolerance `ERROR_BAR` (1e-3, config.h:21).  Adds what the reference
lacks: a structured report (max error, location, count) and an assert-style
entry point so test suites actually fail on mismatch (the reference's
unit_test returns 0 even when validation fails, unit_test.cu:177-187 —
documented deviation)."""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import DEFAULT, SBlasConfig


@dataclasses.dataclass(frozen=True)
class VerifyReport:
    ok: bool
    max_abs_err: float
    max_rel_err: float
    n_bad: int
    worst_index: tuple

    def __str__(self) -> str:  # the reference prints "Validation = True"
        return (f"Validation = {self.ok} (max_abs={self.max_abs_err:.3e}, "
                f"max_rel={self.max_rel_err:.3e}, bad={self.n_bad})")


def check_equal(x, y, error_bar: float | None = None,
                relative: bool = False,
                config: SBlasConfig = DEFAULT) -> VerifyReport:
    """Elementwise |x - y| <= error_bar (reference utility.h:182-193).

    `relative=True` scales the bar by max(1, |y|) — needed for large random
    operands in float32 where the reference's absolute 1e-3 (tuned for its
    double-precision drivers) is unattainable; off by default for parity."""
    bar = config.error_bar if error_bar is None else error_bar
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    diff = np.abs(x - y)
    denom = np.maximum(1.0, np.abs(y))
    rel = diff / denom
    err = rel if relative else diff
    bad = err > bar
    n_bad = int(bad.sum())
    flat_worst = int(np.argmax(err)) if err.size else 0
    worst = np.unravel_index(flat_worst, err.shape) if err.size else ()
    return VerifyReport(
        ok=n_bad == 0,
        max_abs_err=float(diff.max()) if diff.size else 0.0,
        max_rel_err=float(rel.max()) if rel.size else 0.0,
        n_bad=n_bad,
        worst_index=tuple(int(i) for i in worst),
    )


def assert_equal(x, y, error_bar: float | None = None,
                 relative: bool = False,
                 config: SBlasConfig = DEFAULT) -> VerifyReport:
    report = check_equal(x, y, error_bar=error_bar, relative=relative,
                         config=config)
    if not report.ok:
        raise AssertionError(str(report))
    return report
