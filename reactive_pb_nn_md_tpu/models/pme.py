"""Smooth Particle-Mesh Ewald, reciprocal space (Essmann 1995).

Maps the reference's pme.f90 onto XLA:

  grid_Q (pme.f90:184-264)        -> B-spline outer-product scatter-add
  MKL forward/backward FFT + CB   -> one rfftn; E = conv/2 sum w CB |F(Q)|^2
  derivative_grid_Q (346-498)     -> autodiff through the scatter + FFT
  CB_array / bm_sq (537-595)      -> cb_half below (jit-able for NPT)
  update_Ewald_self (608-625)     -> ewald_self

The incremental per-diabat update modify_Q_grid (pme.f90:275-335) becomes
delta_Q_grid: a scatter of only the changed atoms' charge deltas, batched
over diabats by the EVB layer.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import CONV_E2A_KJMOL, SQRT_PI
from ..utils import pbc
from ..ops.bspline import bspline_weights, bm_sq_factors


def spread_weights(u, K, order):
    """Per-atom spreading weights and flat grid indices.

    u: (n, 3) scaled coords in [0, K).
    Returns w: (n, order^3) weights, flat_idx: (n, order^3) int32 indices
    into the flattened (K,K,K) grid.  Grid point for slot k along an axis is
    (floor(u) - k) mod K (pme.f90:224-244).
    """
    w, nearpt = bspline_weights(u.reshape(-1), order)
    w = w.reshape(*u.shape, order)          # (n, 3, order)
    nearpt = nearpt.reshape(*u.shape)       # (n, 3)
    k = jnp.arange(order, dtype=jnp.int32)
    idx = jnp.mod(nearpt[..., None] - k, K)  # (n, 3, order)

    w3 = (w[:, 0, :, None, None] * w[:, 1, None, :, None]
          * w[:, 2, None, None, :])
    flat = ((idx[:, 0, :, None, None] * K + idx[:, 1, None, :, None]) * K
            + idx[:, 2, None, None, :])
    n = u.shape[0]
    o3 = order ** 3
    return w3.reshape(n, o3), flat.reshape(n, o3)


def charge_grid(x, q, box, K, order):
    """Q grid from all atoms (grid_Q)."""
    u = pbc.scaled_grid_coords(x, box, K)
    w, flat = spread_weights(u, K, order)
    vals = (q[:, None] * w).reshape(-1)
    Q = jnp.zeros((K * K * K,), dtype=x.dtype)
    Q = Q.at[flat.reshape(-1)].add(vals)
    return Q.reshape(K, K, K)


def delta_charge_grid(x, dq, atom_idx, mask, box, K, order):
    """Incremental grid update for a set of changed atoms (modify_Q_grid).

    atom_idx: (C,) indices of changed atoms (-1 padded, mask False there).
    dq: (C,) charge deltas in the target topology minus base topology.
    """
    xi = x[jnp.maximum(atom_idx, 0)]
    u = pbc.scaled_grid_coords(xi, box, K)
    w, flat = spread_weights(u, K, order)
    vals = (jnp.where(mask, dq, 0.0)[:, None] * w).reshape(-1)
    dQ = jnp.zeros((K * K * K,), dtype=x.dtype)
    dQ = dQ.at[flat.reshape(-1)].add(vals)
    return dQ.reshape(K, K, K)


def cb_half(box, K, order, alpha, dtype=jnp.float64):
    """CB array (Essmann B.C factors) on the rfft half-spectrum, jit-able.

    CB(m) = exp(-pi^2 |m|^2/alpha^2) / (pi V |m|^2) * |b1|^2 |b2|^2 |b3|^2,
    CB(0) = 0 (pme.f90:537-573).  Also returns the plane weights (2 for
    planes with a distinct conjugate, 1 otherwise).
    """
    vol = pbc.box_volume(box)
    kk = pbc.recip_vectors(box)
    m1 = jnp.where(jnp.arange(K) > K // 2, jnp.arange(K) - K, jnp.arange(K))
    Kh = K // 2 + 1
    m3 = jnp.arange(Kh)
    bm = jnp.asarray(bm_sq_factors(K, order), dtype)

    mm = (m1[:, None, None, None] * kk[0]
          + m1[None, :, None, None] * kk[1]
          + m3[None, None, :, None] * kk[2])          # (K,K,Kh,3)
    mag = jnp.sum(mm * mm, axis=-1)
    mag_safe = jnp.where(mag > 0, mag, 1.0)
    cb = (jnp.exp(-np.pi ** 2 * mag / alpha ** 2)
          / (vol * np.pi * mag_safe)
          * bm[:, None, None] * bm[None, :, None] * bm[None, None, :Kh])
    cb = jnp.where(mag > 0, cb, 0.0)
    # rfft plane weights along the last axis
    w = jnp.full((Kh,), 2.0, dtype)
    w = w.at[0].set(1.0)
    if K % 2 == 0:
        w = w.at[Kh - 1].set(1.0)
    return cb * w[None, None, :]


def recip_energy(Q, cbw):
    """E_recip = conv/2 * sum w CB |F(Q)|^2 over the half spectrum."""
    F = jnp.fft.rfftn(Q)
    return 0.5 * CONV_E2A_KJMOL * jnp.sum(cbw * (F.real ** 2 + F.imag ** 2))


def recip_energy_batched(Qs, cbw):
    """Batched over leading diabat axis -- one batched FFT replaces the
    reference's OpenMP loop over per-diabat MKL FFTs (ms_evb.f90:2019-2090)."""
    F = jnp.fft.rfftn(Qs, axes=(-3, -2, -1))
    return 0.5 * CONV_E2A_KJMOL * jnp.sum(
        cbw * (F.real ** 2 + F.imag ** 2), axis=(-3, -2, -1))


def ewald_self(q, alpha):
    """-(alpha/sqrt(pi)) sum q_i^2 (update_Ewald_self, pme.f90:608-625)."""
    return -alpha / SQRT_PI * jnp.sum(q * q) * CONV_E2A_KJMOL
