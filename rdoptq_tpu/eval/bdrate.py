"""Bjøntegaard delta metrics (BD-rate / BD-PSNR).

Same capability as the reference's BD-rate.py:17-87: cubic polynomial fit
of PSNR vs log-rate, integrated over the overlapping interval, plus the
piecewise-cubic-hermite (pchip) variant (BD-rate.py:68-82) which is
robust when a cubic polynomial oscillates through >4 RD points. Pure
numpy/scipy (host-side; these run on a handful of RD points).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _fit_and_integrate(x: np.ndarray, y: np.ndarray, lo: float,
                       hi: float, piecewise: bool = False) -> float:
    if piecewise:
        from scipy.interpolate import PchipInterpolator
        order = np.argsort(x)
        interp = PchipInterpolator(x[order], y[order])
        return float(interp.antiderivative()(hi)
                     - interp.antiderivative()(lo))
    coeffs = np.polyfit(x, y, 3)
    poly_int = np.polyint(coeffs)
    return float(np.polyval(poly_int, hi) - np.polyval(poly_int, lo))


def bd_psnr(rate_anchor: Sequence[float], psnr_anchor: Sequence[float],
            rate_test: Sequence[float], psnr_test: Sequence[float],
            piecewise: bool = False) -> float:
    """Average PSNR difference (dB) of test over anchor at equal rate."""
    lr_a = np.log(np.asarray(rate_anchor, dtype=np.float64))
    lr_t = np.log(np.asarray(rate_test, dtype=np.float64))
    p_a = np.asarray(psnr_anchor, dtype=np.float64)
    p_t = np.asarray(psnr_test, dtype=np.float64)
    lo = max(lr_a.min(), lr_t.min())
    hi = min(lr_a.max(), lr_t.max())
    int_a = _fit_and_integrate(lr_a, p_a, lo, hi, piecewise)
    int_t = _fit_and_integrate(lr_t, p_t, lo, hi, piecewise)
    return (int_t - int_a) / (hi - lo)


def bd_rate(rate_anchor: Sequence[float], psnr_anchor: Sequence[float],
            rate_test: Sequence[float], psnr_test: Sequence[float],
            piecewise: bool = False) -> float:
    """Average rate overhead (%) of test over anchor at equal quality.
    Positive => test needs more bits than the anchor. ``piecewise=True``
    uses the pchip interpolant (reference BD-rate.py:68-82) instead of
    the cubic polynomial fit."""
    lr_a = np.log(np.asarray(rate_anchor, dtype=np.float64))
    lr_t = np.log(np.asarray(rate_test, dtype=np.float64))
    p_a = np.asarray(psnr_anchor, dtype=np.float64)
    p_t = np.asarray(psnr_test, dtype=np.float64)
    lo = max(p_a.min(), p_t.min())
    hi = min(p_a.max(), p_t.max())
    int_a = _fit_and_integrate(p_a, lr_a, lo, hi, piecewise)
    int_t = _fit_and_integrate(p_t, lr_t, lo, hi, piecewise)
    avg_diff = (int_t - int_a) / (hi - lo)
    return float((np.exp(avg_diff) - 1.0) * 100.0)


__all__ = ["bd_rate", "bd_psnr"]
