"""Pallas PME spread kernel vs the XLA scatter reference (interpret mode on
CPU; the same code compiles for the TPU MXU/VPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from reactive_pb_nn_md_tpu.models import pme
from reactive_pb_nn_md_tpu.ops.pallas.pme_spread import charge_grid_pallas


def _random_system(n=40, K=16, L=12.0, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, L, (n, 3)))
    q = jnp.asarray(rng.uniform(-1, 1, (n,)))
    box = jnp.eye(3, dtype=x.dtype) * L
    return x, q, box


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
