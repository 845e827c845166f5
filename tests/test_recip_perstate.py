"""Fused per-diabat reciprocal-delta Pallas kernel vs the XLA spectrum
matmul (interpret mode on CPU; the same code compiles for the TPU MXU).

The kernel contracts in bf16x3 passes (lax.Precision.HIGH class), so f32
comparisons carry a ~1e-5 relative tolerance; fp64 engine paths never
dispatch to it (models/pme._pallas_perstate_active)."""

import jax
import jax.numpy as jnp
import numpy as np

from reactive_pb_nn_md_tpu.models import pme
from reactive_pb_nn_md_tpu.ops.pallas.recip_perstate import (
    perstate_recip_energy)

F32 = jnp.float32


def _inputs(S=16, U=24, K=16, seed=0):
    rng = np.random.default_rng(seed)
    Kh = K // 2 + 1
    Mh = K * Kh
    Mp = -(-Mh // 128) * 128

    def r(*s):
        return jnp.asarray(rng.standard_normal(s), F32)

    def padl(a):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Mp - a.shape[-1])])

    dq = r(S, U) * 0.3
    ar, ai = r(K, U), r(K, U)
    bcr, bci = padl(r(U, Mh)), padl(r(U, Mh))
    f0r, f0i = padl(r(K, Mh)), padl(r(K, Mh))
    cbw = padl(jnp.asarray(rng.uniform(0, 1, (K, Mh)), F32))
    return dq, ar, ai, bcr, bci, f0r, f0i, cbw


def _reference(dq, ar, ai, bcr, bci, f0r, f0i, cbw):
    """Dense spectrum formulation (the XLA path's math, f32 on CPU)."""
    gr = jnp.einsum("su,ku,um->skm", dq, ar, bcr) \
        - jnp.einsum("su,ku,um->skm", dq, ai, bci)
    gi = jnp.einsum("su,ku,um->skm", dq, ar, bci) \
        + jnp.einsum("su,ku,um->skm", dq, ai, bcr)
    t = cbw[None] * (f0r[None] * gr + f0i[None] * gi
                     + 0.5 * (gr ** 2 + gi ** 2))
    return jnp.sum(t, axis=(1, 2))


def test_forward_matches_dense():
    args = _inputs()
    e_k = perstate_recip_energy(*args)
    e_r = _reference(*args)
    np.testing.assert_allclose(np.asarray(e_k), np.asarray(e_r),
                               rtol=5e-5, atol=5e-5)


def test_gradients_match_dense():
    args = _inputs(seed=3)
    gb = jnp.asarray(np.random.default_rng(7).standard_normal(16), F32)

    def loss_k(*a):
        return jnp.sum(gb * perstate_recip_energy(*a))

    def loss_r(*a):
        return jnp.sum(gb * _reference(*a))

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    names = ["dq", "ar", "ai", "bcr", "bci", "f0r", "f0i"]
    for n, a, b in zip(names, gk, gr):
        # two chained bf16x3 contractions (recompute G, contract dG) vs
        # the reference's exact-f32 CPU einsums: tolerance scaled to the
        # cotangent's magnitude, not elementwise (cancellation makes tiny
        # elements' relative error meaningless); the production XLA path
        # backward runs the same HIGH precision class
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5 * scale,
                                   err_msg=n)


def test_recip_delta_perstate_dispatch():
    """recip_delta_perstate: forced pallas vs forced xla at f32, values
    and position gradients, S not a multiple of 8 (padding path)."""
    rng = np.random.default_rng(1)
    K, order, S, U = 16, 6, 5, 12
    L = 9.0
    box = jnp.eye(3, dtype=F32) * L
    x_u = jnp.asarray(rng.uniform(0, L, (U, 3)), F32)
    u_mask = jnp.asarray(rng.uniform(size=U) > 0.2)
    dq = jnp.asarray(rng.standard_normal((S, U)), F32) * 0.2
    cbw = pme.cb_half(box, K, order, 0.5, dtype=F32)
    Q0 = jnp.asarray(rng.standard_normal((K, K, K)), F32)
    F0 = jnp.fft.rfftn(Q0).astype(jnp.complex64)

    def run(x_u_in):
        return jnp.sum(pme.recip_delta_perstate(
            x_u_in, u_mask, dq, box, K, order, cbw, F0))

    try:
        pme.set_perstate_impl("xla")
        e_x = pme.recip_delta_perstate(x_u, u_mask, dq, box, K, order,
                                       cbw, F0)
        g_x = jax.grad(run)(x_u)
        pme.set_perstate_impl("pallas")
        e_p = pme.recip_delta_perstate(x_u, u_mask, dq, box, K, order,
                                       cbw, F0)
        g_p = jax.grad(run)(x_u)
    finally:
        pme.set_perstate_impl("auto")

    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=2e-4, atol=2e-4)
