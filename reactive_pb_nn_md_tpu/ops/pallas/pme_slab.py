"""Pallas TPU kernel: slab-binned PME charge spread / interpolation.

Second-generation replacement for grid_Q / derivative_grid_Q
(pme.f90:184-264, :346-498).  The first Pallas kernel (pme_spread.py)
already keeps the grid VMEM-resident, but its inner loop is one
dynamic-slice read-modify-write of an (order, order, P) brick PER ATOM --
a serialized chain of ~N small VPU ops (measured ~200 ns/atom/direction;
4.1 ms fwd+bwd at 10^4 atoms, K=64).

This kernel restructures the spread as K slab-sized MXU contractions:

  * every atom's x-corner c1 is an integer in [0, K); atoms are binned by
    c1 into K slabs of static capacity `scap` (one sort, the same binning
    trick as the fused real-space kernel);
  * the y/z spline weights are placed at their lane offsets as dense
    (n, P) rows (P = K + order - 1, halo-padded grid, wraparound folded
    once at the end by cheap XLA adds);
  * slab b's contribution to grid rows [b, b+order) is, for each x-slot o,

        Q[b+o, :, :] += (q * wx[:, o] * WY).T @ WZ

    -- one MXU dot_general per x-slot: the whole slab lands in `order`
    (P, P) matmuls and ONE (order, P, P) window accumulation, instead of
    scap sequential brick RMWs;
  * the backward pass is the transpose: per slab, per x-slot o,
    M_o = WZ @ C_o^T and M'_o = dWZ @ C_o^T against the cotangent window
    C_o = gQ[b+o] give every atom's charge and position cotangents as
    row reductions -- no per-atom gathers at all.

Layout notes (measured on v5e): the per-atom rows are packed into ONE
(K*scap, 640) array whose segments start at lane multiples of 128 --
unaligned segment slices forced Mosaic lane rotations that tripled the
backward kernel's time -- and the pack is BLOCKED per slab (scap rows per
program, pipelined) rather than held fully VMEM-resident.

Atom binning overflow (a slab holding more than scap atoms) is flagged by
`pme_slab_overflow` and handled by the driver exactly like neighbor-list /
cell overflow: regrow the static capacity (System.pme_scap) and rebuild.

Falls back to interpret mode off-TPU so CPU tests run the same code.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import pbc
from .pme_spread import _axis_weights, _lane_rows, _fold_halo, _pad_halo, \
    _on_tpu

# pack lane offsets (segments 128-aligned; P = K + order - 1 <= 128 for
# every supported grid up to K = 121)
_SEG = 128
_LANES = 5 * _SEG            # wy | wz | dwy | dwz | [wxq wx dwx] x 8


def suggest_slab_cap(n_atoms, K, safety=1.25):
    """Static per-slab atom capacity (multiple of 8 for fp32 sublanes).

    Liquid-density slab occupancy is tightly concentrated around the mean
    N/K; the 6-sigma Poisson tail + multiplicative safety covers NPT
    density fluctuation.  Overflow is flagged, never silent."""
    import math
    mean = n_atoms / K
    cap = mean * safety + 6.0 * math.sqrt(max(mean, 1.0)) + 8.0
    cap = int(-(-int(math.ceil(cap)) // 8) * 8)
    return max(8, min(cap, n_atoms))


def _bin_by_slab(c1, K, scap):
    """Slot of each atom in the (K*scap,) slab-major layout + overflow.

    c1: (N,) int32 x-corner in [0, K).  Overflowing atoms land on a dump
    row (index K*scap) that callers slice off."""
    N = c1.shape[0]
    order = jnp.argsort(c1).astype(jnp.int32)
    sorted_id = c1[order]
    ar = jnp.arange(N, dtype=jnp.int32)
    first = jnp.concatenate([jnp.array([True]),
                             sorted_id[1:] != sorted_id[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, ar, 0))
    rank = ar - run_start
    overflow = jnp.any(rank >= scap)
    slot_sorted = jnp.where(rank < scap, sorted_id * scap + rank, K * scap)
    slot = jnp.zeros((N,), jnp.int32).at[order].set(slot_sorted)
    return slot, overflow


def pme_slab_overflow(x, box, K, order, scap):
    """Standalone overflow probe (cheap XLA; CSEs with the kernel's own
    binning inside the same jitted step)."""
    u = pbc.scaled_grid_coords(x, box, K)
    c1 = jnp.mod(jnp.floor(u[:, 0]) - (order - 1), K).astype(jnp.int32)
    _, over = _bin_by_slab(c1, K, scap)
    return over


def _spread_slab_kernel(pack_ref, qp_ref, *, P, order):
    """One program per x-slab b: `order` MXU dot_generals + one
    (order, P, P) window accumulation at dynamic row start b."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        qp_ref[...] = jnp.zeros(qp_ref.shape, qp_ref.dtype)

    blk = pack_ref[...]                               # (scap, _LANES)
    wy = blk[:, 0:P]
    wz = blk[:, _SEG:_SEG + P]
    wxq = blk[:, 4 * _SEG:4 * _SEG + order]           # q already folded in

    contrib = []
    for o in range(order):
        wsc = wy * wxq[:, o:o + 1]                    # (scap, P)
        c_o = jax.lax.dot_general(
            wsc, wz, (((0,), (0,)), ((), ())),
            preferred_element_type=qp_ref.dtype,
            precision=jax.lax.Precision.HIGHEST)      # (P, P)
        contrib.append(c_o)
    window = qp_ref[pl.ds(b, order), :, :]
    qp_ref[pl.ds(b, order), :, :] = window + jnp.stack(contrib)


def _interp_slab_kernel(pack_ref, gqp_ref, out_ref, *, P, order):
    """Backward: per slab, contract the cotangent window with the spline
    rows; outputs per-atom [gq, s1, s2, s3] (s = dE/du before the q and
    box-transform factors)."""
    blk = pack_ref[...]                               # (scap, _LANES)
    b = pl.program_id(0)
    wy = blk[:, 0:P]
    wz = blk[:, _SEG:_SEG + P]
    dwy = blk[:, 2 * _SEG:2 * _SEG + P]
    dwz = blk[:, 3 * _SEG:3 * _SEG + P]
    wx = blk[:, 4 * _SEG + 8:4 * _SEG + 8 + order]
    dwx = blk[:, 4 * _SEG + 16:4 * _SEG + 16 + order]

    f = blk.dtype
    scap = blk.shape[0]
    gq = jnp.zeros((scap, 1), f)
    s1 = jnp.zeros((scap, 1), f)
    s2 = jnp.zeros((scap, 1), f)
    s3 = jnp.zeros((scap, 1), f)
    # HIGHEST is precision-MANDATED here, not a default: a bf16x3 (HIGH
    # class) variant was measured at ~5e-4 relative force error -- the
    # spline-DERIVATIVE rows sum to zero, so the contraction cancels
    # catastrophically and the 3-limb scheme's missing low products
    # surface at the result scale (tests/test_pallas_pme.py would catch
    # it).  Mosaic kernel dots only support DEFAULT / HIGHEST.
    hi = jax.lax.Precision.HIGHEST
    for o in range(order):
        C = gqp_ref[pl.ds(b + o, 1), :, :][0]         # (P_y, P_z)
        # M[u, y] = sum_z wz_u(z) C[y, z]
        M = jax.lax.dot_general(wz, C, (((1,), (1,)), ((), ())),
                                preferred_element_type=f,
                                precision=hi)         # (scap, P)
        Md = jax.lax.dot_general(dwz, C, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f,
                                 precision=hi)        # (scap, P)
        t = jnp.sum(wy * M, axis=1, keepdims=True)    # (scap, 1)
        t2 = jnp.sum(dwy * M, axis=1, keepdims=True)
        t3 = jnp.sum(wy * Md, axis=1, keepdims=True)
        gq = gq + wx[:, o:o + 1] * t
        s1 = s1 + dwx[:, o:o + 1] * t
        s2 = s2 + wx[:, o:o + 1] * t2
        s3 = s3 + wx[:, o:o + 1] * t3
    out_ref[...] = jnp.concatenate(
        [gq, s1, s2, s3, jnp.zeros((scap, 4), f)], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def charge_grid_slab(x, q, box, K, order, scap):
    """Drop-in replacement for models.pme.charge_grid (TPU fp32 path).

    scap: static per-slab capacity (suggest_slab_cap); overflow is
    reported by pme_slab_overflow and regrown by the driver.  Like
    charge_grid_pallas, the VJP returns a zero box cotangent (nothing in
    the engine differentiates wrt the box through the grid)."""
    return _fwd(x, q, box, K, order, scap)[0]


def _build_pack(x, q, box, K, order, scap):
    """(K*scap, _LANES) slab-major pack: [wy | wz | dwy | dwz | wxq wx
    dwx], segments at 128-lane offsets, assembled by ONE row gather."""
    f = x.dtype
    N = x.shape[0]
    P = K + order - 1
    assert P <= _SEG, f"pme grid K={K} exceeds the slab kernel's lane seg"
    w, dw, corner = _axis_weights(x, box, K, order)
    slot, _ = _bin_by_slab(corner[:, 0], K, scap)

    def seg(a):
        return jnp.concatenate(
            [a, jnp.zeros((N, _SEG - a.shape[1]), f)], axis=1)

    def pad8(a):
        return jnp.concatenate(
            [a, jnp.zeros((N, 8 - order), f)], axis=1) if order < 8 else a

    rows = jnp.concatenate(
        [seg(_lane_rows(w[:, 1], corner[:, 1], P)),       # wy
         seg(_lane_rows(w[:, 2], corner[:, 2], P)),       # wz
         seg(_lane_rows(dw[:, 1], corner[:, 1], P)),      # dwy
         seg(_lane_rows(dw[:, 2], corner[:, 2], P)),      # dwz
         pad8(w[:, 0] * q[:, None]), pad8(w[:, 0]), pad8(dw[:, 0]),
         jnp.zeros((N, _SEG - 24), f)], axis=1)           # (N, _LANES)
    # inverse permutation (tiny int scatter), then one ROW GATHER: on TPU
    # the gather form beats the (K*scap, _LANES) row scatter
    gidx = jnp.full((K * scap + 1,), N, jnp.int32).at[slot].set(
        jnp.arange(N, dtype=jnp.int32))[:-1]
    rows_pad = jnp.concatenate([rows, jnp.zeros((1, _LANES), f)], axis=0)
    return rows_pad[gidx], slot


def _fwd(x, q, box, K, order, scap):
    f = x.dtype
    P = K + order - 1
    pack, slot = _build_pack(x, q, box, K, order, scap)

    qp = pl.pallas_call(
        functools.partial(_spread_slab_kernel, P=P, order=order),
        grid=(K,),
        out_shape=jax.ShapeDtypeStruct((P, P, P), f),
        in_specs=[pl.BlockSpec((scap, _LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((P, P, P), lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(pack)
    Q = _fold_halo(qp, K, order)
    return Q, (pack, slot, q, box)


def _bwd(K, order, scap, res, gQ):
    pack, slot, q, box = res
    f = gQ.dtype
    P = K + order - 1
    gqp = _pad_halo(gQ, K, order)
    out = pl.pallas_call(
        functools.partial(_interp_slab_kernel, P=P, order=order),
        grid=(K,),
        out_shape=jax.ShapeDtypeStruct((K * scap, 8), f),
        in_specs=[
            pl.BlockSpec((scap, _LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P, P), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((scap, 8), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(pack, gqp)
    outp = jnp.concatenate([out, jnp.zeros((1, 8), f)], axis=0)
    g = outp[slot]                                     # (N, 8) row gather
    gq = g[:, 0]
    ds_du = q[:, None] * g[:, 1:4]
    gx = K * (ds_du @ pbc.recip_vectors(box))
    return gx, gq, jnp.zeros_like(box)


charge_grid_slab.defvjp(_fwd, _bwd)
