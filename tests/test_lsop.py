"""LSOP-12 kernel tests (mirrors lsop/LsOptimalPredictor12Test)."""

from __future__ import annotations

import numpy as np
import pytest

from gridfour_spark import lsop


def _smooth(nr=101, nc=101):
    r, c = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")
    return np.floor(
        4000 * np.sin(r * 0.021) * np.cos(c * 0.017) + 2000 * np.sin(r * 0.005 + c * 0.003)
    ).astype(np.int32)


def test_round_trip_smooth_101():
    v = _smooth()
    res = lsop.encode_lsop(v.ravel(), 101, 101)
    assert res is not None
    back = lsop.decode_lsop(res["payload"], 101, 101)
    np.testing.assert_array_equal(back, v)
    # smooth DEM-like surface compresses to the low-bits regime
    assert 8 * res["n_bytes"] / v.size < 4.0


def test_round_trip_noise_and_ragged():
    rng = np.random.default_rng(1)
    for shape in [(8, 9), (6, 6), (13, 40)]:
        n = rng.integers(-10000, 10000, size=shape).astype(np.int32)
        res = lsop.encode_lsop(n.ravel(), *shape)
        back = lsop.decode_lsop(res["payload"], *shape)
        np.testing.assert_array_equal(back, n)


def test_grid_too_small_declined():
    """Reference returns null for grids under 6x6 (LsOptimalPredictor12.java:114-116)."""
    v = np.arange(25, dtype=np.int32)
    assert lsop.encode_lsop(v, 5, 5) is None


def test_coefficient_solve_satisfies_lagrange_system():
    """The reference solves least squares SUBJECT TO the sum constraint
    sum(predictions) == sum(targets) via a Lagrange multiplier (13th row,
    computeCoefficients :346-368) — verify both properties directly."""
    v = _smooth(40, 40)
    u = lsop.compute_coefficients(v.ravel(), 40, 40)
    Z = np.stack(lsop._stencil_views(v.astype(np.float64)), axis=1)
    s = Z.sum(axis=0)
    # constraint: sum of predictions equals sum of targets
    np.testing.assert_allclose(s[1:] @ u, s[0], rtol=1e-12)
    # optimality within the constraint: gradient of ||Z[:,1:]u - z0||^2 is
    # parallel to the constraint gradient s[1:]
    grad = 2 * (Z[:, 1:].T @ (Z[:, 1:] @ u - Z[:, 0]))
    lam = grad @ s[1:] / (s[1:] @ s[1:])
    np.testing.assert_allclose(grad, lam * s[1:], rtol=1e-6, atol=1e-4)
    # and it beats the unconstrained-no-intercept predictor only slightly:
    # residual magnitude stays small on a smooth surface
    resid = Z[:, 1:] @ u - Z[:, 0]
    assert np.abs(resid).mean() < 1.0


def test_prediction_is_float32_exact():
    """The interior prediction must be binary32 step-by-step (strictfp parity):
    recompute one cell with python floats via struct rounding and compare."""
    import struct

    v = _smooth(10, 10).astype(np.int64)
    res = lsop.encode_lsop(v.ravel().astype(np.int32), 10, 10)
    u = res["coefficients"]

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    r, c = 5, 5
    zf = [
        v[r, c - 1], v[r - 1, c - 1], v[r - 1, c], v[r - 1, c + 1], v[r - 1, c + 2],
        v[r, c - 2], v[r - 1, c - 2], v[r - 2, c - 2], v[r - 2, c - 1], v[r - 2, c],
        v[r - 2, c + 1], v[r - 2, c + 2],
    ]
    acc = f32(f32(float(u[0])) * f32(zf[0]))
    for i in range(1, 12):
        acc = f32(acc + f32(f32(float(u[i])) * f32(zf[i])))
    kernel_p = lsop._predict_f32(v, u).reshape(8, 6)[r - 2, c - 2]
    assert acc == float(kernel_p)
