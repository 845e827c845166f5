"""Absolute correctness tests for the Ewald/PME electrostatics.

The Madelung constant of rock salt is an analytic ground truth for the
complete decomposition real + reciprocal + self, independent of the
reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from reactive_pb_nn_md_tpu.models import pme, nonbonded
from reactive_pb_nn_md_tpu.utils import pbc
from reactive_pb_nn_md_tpu.utils.constants import CONV_E2A_KJMOL
import pytest

MADELUNG_NACL = 1.747564594633


def _coulomb_total(x, q, box, alpha, cutoff, K, order):
    """real (all min-image pairs) + recip + self, in kJ/mol."""
    N = x.shape[0]
    ii, jj = np.triu_indices(N, 1)
    dr = x[ii] - x[jj]
    dr = pbc.min_image(dr, box)
    r = jnp.sqrt(jnp.sum(dr * dr, axis=-1))
    mask = r < cutoff
    e_real = jnp.sum(jnp.where(
        mask, nonbonded.ewald_real(q[ii] * q[jj], r, alpha), 0.0))

    Q = pme.charge_grid(x, q, box, K, order)
    cbw = pme.cb_half(box, K, order, alpha, dtype=x.dtype)
    e_recip = pme.recip_energy(Q, cbw)
    e_self = pme.ewald_self(q, alpha)
    return e_real + e_recip + e_self


@pytest.mark.smoke
def test_madelung_nacl():
    d = 2.0                      # nearest-neighbor distance
    L = 2 * d
    # 2x2x2 conventional-like cube: ions at (i,j,k)*d, charge (-1)^(i+j+k)
    pts, qs = [], []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                pts.append([i * d, j * d, k * d])
                qs.append((-1.0) ** (i + j + k))
    x = jnp.asarray(np.array(pts), jnp.float64)
    q = jnp.asarray(np.array(qs), jnp.float64)
    box = jnp.eye(3, dtype=jnp.float64) * L

    e = _coulomb_total(x, q, box, alpha=2.5, cutoff=1.99, K=32, order=6)
    expected = -len(qs) / 2 * MADELUNG_NACL / d * CONV_E2A_KJMOL
    np.testing.assert_allclose(float(e), expected, rtol=2e-6)


def test_madelung_order4():
    d = 2.0
    L = 2 * d
    pts, qs = [], []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                pts.append([i * d + 0.13, j * d - 0.07, k * d + 0.21])
                qs.append((-1.0) ** (i + j + k))
    x = jnp.asarray(np.array(pts), jnp.float64)
    q = jnp.asarray(np.array(qs), jnp.float64)
    box = jnp.eye(3, dtype=jnp.float64) * L
    e = _coulomb_total(x, q, box, alpha=2.5, cutoff=1.99, K=96, order=4)
    expected = -len(qs) / 2 * MADELUNG_NACL / d * CONV_E2A_KJMOL
    np.testing.assert_allclose(float(e), expected, rtol=2e-5)


def test_alpha_invariance():
    """Total Ewald energy must be independent of the splitting parameter."""
    rng = np.random.default_rng(0)
    N = 16
    L = 9.0
    x = jnp.asarray(rng.uniform(0, L, size=(N, 3)))
    q = rng.uniform(-1, 1, size=N)
    q -= q.mean()
    q = jnp.asarray(q)
    box = jnp.eye(3, dtype=jnp.float64) * L

    e1 = _coulomb_total(x, q, box, alpha=0.9, cutoff=4.4, K=48, order=6)
    e2 = _coulomb_total(x, q, box, alpha=1.1, cutoff=4.4, K=64, order=6)
    np.testing.assert_allclose(float(e1), float(e2), rtol=5e-6)


def test_bspline_partition_of_unity():
    from reactive_pb_nn_md_tpu.ops.bspline import bspline_weights
    u = jnp.asarray(np.random.default_rng(1).uniform(0, 30, size=100))
    for order in (4, 6):
        w, _ = bspline_weights(u, order)
        np.testing.assert_allclose(np.sum(np.asarray(w), axis=-1), 1.0,
                                   atol=1e-12)
        assert np.all(np.asarray(w) >= 0)


def test_recip_energy_batched_matches_single():
    rng = np.random.default_rng(2)
    K = 16
    Qs = jnp.asarray(rng.normal(size=(3, K, K, K)))
    box = jnp.eye(3, dtype=jnp.float64) * 10.0
    cbw = pme.cb_half(box, K, 4, 0.4, dtype=jnp.float64)
    eb = pme.recip_energy_batched(Qs, cbw)
    singles = [pme.recip_energy(Qs[i], cbw) for i in range(3)]
    np.testing.assert_allclose(np.asarray(eb), np.asarray(singles), rtol=1e-12)


def test_rfft3_matmul_matches_fft():
    """The MXU matmul DFT (ops/dft.py) must match jnp.fft.rfftn --
    values AND gradients (the force path differentiates through F0)."""
    import jax
    from reactive_pb_nn_md_tpu.ops import dft
    rng = np.random.default_rng(7)
    for K, dt, tol in ((16, jnp.float64, 1e-12), (32, jnp.float32, 2e-4)):
        Q = jnp.asarray(rng.normal(size=(K, K, K)), dt)
        F_mm = dft.rfft3_matmul(Q)
        F_ref = jnp.fft.rfftn(Q.astype(jnp.float64))
        scale = float(jnp.max(jnp.abs(F_ref)))
        np.testing.assert_allclose(np.asarray(F_mm.real),
                                   np.asarray(F_ref.real),
                                   atol=tol * scale)
        np.testing.assert_allclose(np.asarray(F_mm.imag),
                                   np.asarray(F_ref.imag),
                                   atol=tol * scale)
        cbw = jnp.asarray(rng.uniform(0, 1, size=(K, K, K // 2 + 1)), dt)

        def e_of(fft):
            def e(Qx):
                F = fft(Qx)
                return jnp.sum(cbw * (F.real ** 2 + F.imag ** 2))
            return jax.grad(e)(Q)

        g_mm = e_of(dft.rfft3_matmul)
        g_ref = e_of(jnp.fft.rfftn)
        gs = float(jnp.max(jnp.abs(g_ref)))
        np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref),
                                   atol=tol * gs)
