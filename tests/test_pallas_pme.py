"""Pallas PME spread kernels vs the XLA scatter reference (interpret mode
on CPU; the same code compiles for the TPU MXU/VPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from reactive_pb_nn_md_tpu.models import pme
from reactive_pb_nn_md_tpu.ops.pallas.pme_spread import charge_grid_pallas
import pytest

from reactive_pb_nn_md_tpu.ops.pallas.pme_slab import (
    charge_grid_slab, pme_slab_overflow, suggest_slab_cap)


def _random_system(n=40, K=16, L=12.0, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, L, (n, 3)))
    q = jnp.asarray(rng.uniform(-1, 1, (n,)))
    box = jnp.eye(3, dtype=x.dtype) * L
    return x, q, box


@pytest.mark.smoke
def test_spread_matches_xla():
    x, q, box = _random_system()
    for order in (4, 6):
        Q_ref = pme.charge_grid(x, q, box, 16, order)
        Q_pal = charge_grid_pallas(x, q, box, 16, order)
        np.testing.assert_allclose(np.asarray(Q_pal), np.asarray(Q_ref),
                                   rtol=1e-10, atol=1e-12)


def test_recip_energy_grad_matches():
    x, q, box = _random_system(n=30, seed=3)
    K, order = 16, 6
    cbw = pme.cb_half(box, K, order, 0.6, dtype=x.dtype)

    def e_ref(xx, qq):
        return pme.recip_energy(pme.charge_grid(xx, qq, box, K, order), cbw)

    def e_pal(xx, qq):
        return pme.recip_energy(charge_grid_pallas(xx, qq, box, K, order),
                                cbw)

    np.testing.assert_allclose(float(e_pal(x, q)), float(e_ref(x, q)),
                               rtol=1e-12)
    gx_r, gq_r = jax.grad(e_ref, argnums=(0, 1))(x, q)
    gx_p, gq_p = jax.grad(e_pal, argnums=(0, 1))(x, q)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_r),
                               rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# slab-binned kernel (ops/pallas/pme_slab.py)
# ---------------------------------------------------------------------------

def test_slab_spread_matches_xla():
    x, q, box = _random_system(n=60, K=16, seed=1)
    for order in (4, 6):
        scap = suggest_slab_cap(60, 16)
        Q_ref = pme.charge_grid(x, q, box, 16, order)
        Q_sl = jax.jit(charge_grid_slab,
                       static_argnums=(3, 4, 5))(x, q, box, 16, order, scap)
        np.testing.assert_allclose(np.asarray(Q_sl), np.asarray(Q_ref),
                                   rtol=1e-10, atol=1e-12)


def test_slab_recip_energy_grad_matches():
    x, q, box = _random_system(n=30, seed=3)
    K, order = 16, 6
    scap = suggest_slab_cap(30, K)
    cbw = pme.cb_half(box, K, order, 0.6, dtype=x.dtype)

    def e_ref(xx, qq):
        return pme.recip_energy(pme.charge_grid(xx, qq, box, K, order), cbw)

    def e_sl(xx, qq):
        return pme.recip_energy(
            charge_grid_slab(xx, qq, box, K, order, scap), cbw)

    np.testing.assert_allclose(float(e_sl(x, q)), float(e_ref(x, q)),
                               rtol=1e-12)
    gx_r, gq_r = jax.grad(e_ref, argnums=(0, 1))(x, q)
    gx_s, gq_s = jax.grad(e_sl, argnums=(0, 1))(x, q)
    # tight tolerances are load-bearing: they pin the backward's HIGHEST
    # contraction (a bf16x3 variant measured 5e-4 relative force error --
    # the spline-derivative rows cancel catastrophically)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gq_s), np.asarray(gq_r),
                               rtol=1e-8, atol=1e-10)


def test_slab_tight_capacity_exact():
    """scap exactly equal to the fullest slab: no overflow, exact grid."""
    x, q, box = _random_system(n=48, K=8, seed=5)
    order = 6
    from reactive_pb_nn_md_tpu.utils import pbc
    u = pbc.scaled_grid_coords(x, box, 8)
    c1 = np.mod(np.floor(np.asarray(u[:, 0])) - (order - 1), 8).astype(int)
    tight = int(np.bincount(c1, minlength=8).max())
    tight = -(-tight // 8) * 8      # sublane-rounded like suggest_slab_cap
    Q_ref = pme.charge_grid(x, q, box, 8, order)
    Q_sl = charge_grid_slab(x, q, box, 8, order, tight)
    np.testing.assert_allclose(np.asarray(Q_sl), np.asarray(Q_ref),
                               rtol=1e-10, atol=1e-12)
    assert not bool(pme_slab_overflow(x, box, 8, order, tight))


def test_slab_overflow_flagged():
    """All atoms piled into one slab overflow a mean-sized capacity."""
    rng = np.random.default_rng(7)
    n, K, L = 64, 16, 12.0
    x = jnp.asarray(np.concatenate(
        [rng.uniform(0, 0.3, (n, 1)), rng.uniform(0, L, (n, 2))], axis=1))
    box = jnp.eye(3, dtype=x.dtype) * L
    assert bool(pme_slab_overflow(x, box, K, 6, 8))
    x_u = jnp.asarray(rng.uniform(0, L, (n, 3)))
    assert not bool(pme_slab_overflow(x_u, box, K, 6,
                                      suggest_slab_cap(n, K)))
