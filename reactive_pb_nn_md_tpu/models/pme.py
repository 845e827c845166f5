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


_SPREAD_IMPL = "auto"       # "auto" (pallas on TPU fp32) | "xla" | "pallas"


def set_spread_impl(impl):
    """Select the charge-spreading kernel ("auto", "xla", "pallas")."""
    global _SPREAD_IMPL
    assert impl in ("auto", "xla", "pallas"), impl
    _SPREAD_IMPL = impl


def _pallas_spread_active(dtype):
    if _SPREAD_IMPL != "auto":
        return _SPREAD_IMPL == "pallas"
    import jax as _jax
    return (_jax.default_backend() == "tpu" and dtype == jnp.float32)


_PERSTATE_IMPL = "auto"         # "auto" | "pallas" | "xla"


def set_perstate_impl(impl):
    """Select the per-diabat reciprocal-delta implementation: the fused
    Pallas kernel (TPU fp32 default) or the XLA spectrum matmul."""
    global _PERSTATE_IMPL
    assert impl in ("auto", "pallas", "xla"), impl
    _PERSTATE_IMPL = impl


def _pallas_perstate_active(dtype):
    if _PERSTATE_IMPL != "auto":
        return _PERSTATE_IMPL == "pallas"
    import jax as _jax
    return (_jax.default_backend() == "tpu" and dtype == jnp.float32)


def charge_grid_xla(x, q, box, K, order):
    """Q grid from all atoms (grid_Q) -- XLA scatter-add path."""
    u = pbc.scaled_grid_coords(x, box, K)
    w, flat = spread_weights(u, K, order)
    vals = (q[:, None] * w).reshape(-1)
    Q = jnp.zeros((K * K * K,), dtype=x.dtype)
    Q = Q.at[flat.reshape(-1)].add(vals)
    return Q.reshape(K, K, K)


def charge_grid(x, q, box, K, order, scap=0):
    """Q grid from all atoms (grid_Q).

    On TPU fp32 this dispatches to a Pallas kernel instead of the XLA
    scatter-add: with a static per-slab capacity (scap > 0, from
    System.pme_scap / pme_slab.suggest_slab_cap) the slab-binned MXU
    kernel (ops/pallas/pme_slab.py); otherwise the per-atom VMEM spread
    (ops/pallas/pme_spread.py; 2.7x faster fwd+bwd at K=32 and 9x at
    K=64 vs XLA -- the slab kernel is faster still, see
    scripts/time_pme_spread.py).  Note the Pallas VJPs return a zero box
    cotangent (no virial through the grid; nothing differentiates wrt
    the box)."""
    # both Pallas spread kernels hold K+order-1 grid lanes per row; past
    # one 128-lane segment (K > 123 at order 6) Mosaic rejects the
    # layout -- K=128+ boxes take the XLA scatter-add
    if _pallas_spread_active(x.dtype) and K + order - 1 <= 128:
        if scap:
            from ..ops.pallas.pme_slab import charge_grid_slab
            return charge_grid_slab(x, q, box, K, order, scap)
        from ..ops.pallas.pme_spread import charge_grid_pallas
        return charge_grid_pallas(x, q, box, K, order)
    return charge_grid_xla(x, q, box, K, order)


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
    from ..ops.dft import rfft3_fast
    F = rfft3_fast(Q)
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


# ---------------------------------------------------------------------------
# per-diabat reciprocal energies WITHOUT per-diabat FFTs
# ---------------------------------------------------------------------------

def structure_axis_factors(x_u, box, K, order):
    """Per-axis structure factors of each atom's B-spline spread:
    Phi_u(m) = A_u(m1) B_u(m2) C_u(m3) with
    A_u(m) = sum_j w_uj exp(-2 pi i m g_uj / K) (and likewise B, C; the
    third axis only needs the rfft half spectrum).

    This is the analytic DFT of what grid_Q scatters for one unit charge
    at x_u (separability follows from the tensor-product spline spread,
    pme.f90:224-244).  The phase argument is reduced mod K in exact
    integer arithmetic so fp32 sincos stays fully accurate.

    Returns (A (U, K), B (U, K), C (U, K//2+1)) complex.
    """
    f = x_u.dtype
    u = pbc.scaled_grid_coords(x_u, box, K)                 # (U, 3)
    w, nearpt = bspline_weights(u.reshape(-1), order)
    w = w.reshape(*u.shape, order)                          # (U, 3, order)
    nearpt = nearpt.reshape(*u.shape).astype(jnp.int32)     # (U, 3)
    k = jnp.arange(order, dtype=jnp.int32)
    g = jnp.mod(nearpt[..., None] - k, K)                   # (U, 3, order)

    def axis_factor(axis, n_m):
        m = jnp.arange(n_m, dtype=jnp.int32)
        # integer phase m*g mod K stays exact; fp32 sincos of [0, 2pi)
        ph = jnp.mod(m[None, None, :] * g[:, axis, :, None], K)  # (U, o, m)
        ang = (-2.0 * np.pi / K) * ph.astype(f)
        e = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        return jnp.einsum("uo,uom->um", w[:, axis, :].astype(f), e)

    return (axis_factor(0, K), axis_factor(1, K), axis_factor(2, K // 2 + 1))


def recip_delta_perstate(x_u, u_mask, dq, box, K, order, cbw, F0):
    """Per-diabat reciprocal energies without per-diabat FFTs.

    For diabat s with changed-atom charge deltas dq_s on the fixed atom
    set x_u, the delta density's half spectrum is G_s = sum_u dq_su Phi_u,
    and EXACTLY (by linearity of the spreading)

        E_recip,s = E_recip,0 + conv sum_m cbw Re(F0* G_s)
                              + conv/2 sum_m cbw |G_s|^2.

    This replaces the reference's per-diabat modify_Q_grid + FFT
    (ms_evb.f90:1962-2095, pme.f90:275-335) with one MXU contraction and
    NO per-diabat FFT: the TPU-native end point of the incremental-PME
    idea.  G_s is built by contracting the state axis against a row-wise
    B*C outer factor WITHOUT ever materializing the (U, K^3/2) per-atom
    spectrum Phi -- at K=64 / U=128 that tensor is ~140 MB of HBM traffic
    per use, which dominated the 10k-atom step profile.  Verified equal
    to the batched-FFT path by tests/test_delta_diag.py.

    dq: (S, U) per-state charge deltas (zero outside u_mask).
    F0: rfftn of the base charge grid.  Returns (S,) delta energies
    (E_recip,s - E_recip,0).
    """
    A, B, C = structure_axis_factors(x_u, box, K, order)
    mask = u_mask.astype(A.real.dtype)
    Kh = K // 2 + 1
    S, U = dq.shape
    dqm = (dq * mask[None, :]).astype(A.real.dtype)
    BC = (B[:, :, None] * C[:, None, :]).reshape(U, K * Kh)

    Mh = K * Kh
    Mp = -(-Mh // 128) * 128
    # the fused kernel's RESIDENT (U, Mp) factor/cotangent blocks also
    # live in scoped VMEM; past the measured-good K=64 spectrum width
    # (Mp 2176) the backward OOMs (25 MB at K=128) -- larger grids take
    # the XLA formulation below
    if _pallas_perstate_active(dq.dtype) and Mp <= 2176:
        # fused Pallas path: the (S, K, K, Kh) spectrum never leaves VMEM
        # (ops/pallas/recip_perstate.py); bit-compatible contraction class
        # (bf16x3 = HIGH) with the XLA formulation below
        from ..ops.pallas.recip_perstate import (perstate_recip_energy,
                                                 MAX_BLOCK_ELEMS, _blk)
        f = dq.dtype

        def padl(a, w):                       # zero-pad last dim to w
            return jnp.pad(a, [(0, 0)] * (a.ndim - 1)
                           + [(0, w - a.shape[-1])])

        args = (A.real.T, A.imag.T,
                padl(BC.real, Mp), padl(BC.imag, Mp),
                padl(F0.real.reshape(K, Mh), Mp),
                padl(F0.imag.reshape(K, Mh), Mp),
                padl(cbw.astype(f).reshape(K, Mh), Mp))
        # state-axis chunking keeps the kernel's live (blk*Sc, Mp)
        # spectrum blocks inside scoped VMEM at large caps (S=80, K=64
        # OOMed at one chunk); each chunk is an independent custom-vjp
        # kernel call, so autodiff composes through the concatenate.
        # Ceiling 80 (not 128): under a replica vmap the batched program
        # tiles carry the batch factor -- at K=32, R=16 the FORWARD
        # overflowed scoped VMEM at a 104-state chunk (by 1%) and the
        # BACKWARD (7 live output blocks) at 96 (24.6M vs 16M), while 80
        # is measured-good (the S=80 16-replica ladder compiles and
        # runs).  Changes nothing for S<=80 configs -- the production cap
        # still runs one chunk.
        Sc = max(8, min(80, MAX_BLOCK_ELEMS // (_blk(K, S, Mp) * Mp)
                        // 8 * 8))
        parts = []
        for s0 in range(0, S, Sc):
            chunk = dqm[s0:s0 + Sc]
            n = chunk.shape[0]
            n8 = -(-n // 8) * 8
            chunk = jnp.pad(chunk, ((0, n8 - n), (0, 0)))
            parts.append(perstate_recip_energy(chunk, *args)[:n])
        e = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        return CONV_E2A_KJMOL * e
    # XLA path (CPU / fp64): one (S*K, U) x (U, K*Kh) complex matmul ->
    # G (S, K, K, Kh).  bf16x3 passes (~21-bit mantissa) instead of the
    # global f32 (x6) pin: the value operands keep ~fp32 accuracy
    # (engine-wide pin stays f32; fp64 ignores the precision option)
    hi = jax.lax.Precision.HIGH
    W = dqm[:, :, None] * A[None]      # W[s,u,m1] = dq_su A_u(m1)
    G = jnp.matmul(W.transpose(0, 2, 1).reshape(S * K, U), BC,
                   precision=hi).reshape(S, K, K, Kh)
    cross = jnp.real(jnp.conj(F0)[None] * G)
    return CONV_E2A_KJMOL * jnp.sum(
        cbw[None] * (cross + 0.5 * (G.real ** 2 + G.imag ** 2)),
        axis=(1, 2, 3))
