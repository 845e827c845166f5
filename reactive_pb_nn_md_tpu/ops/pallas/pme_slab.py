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
  * the y/z spline rows are generated IN-KERNEL from a single scalar per
    axis, z = frac + (order-1) + corner: row lane p carries M_order(z - p),
    which is exactly the dense halo-padded spread row (nonzero on the
    `order` consecutive support lanes, zero elsewhere, zero rows for the
    z = 0 padding).  M_order(z - p) is evaluated by a pointwise Cox-de
    Boor recursion on a lane iota -- no lane placement, no shifts, and the
    per-atom pack shrinks from 640 lanes of prebuilt rows to 8 lanes of
    [z1 z2 z3 q] (the old XLA-side row build + 640-lane row gather was
    ~0.5 ms/step at 10^4 atoms; spline generation is VPU work that
    pipelines under the kernels' MXU dots);
  * slab b's contribution to grid rows [b, b+o) is, for each x-slot o,

        Q[b+o, :, :] += (q * wx[:, o] * WY).T @ WZ

    -- one MXU dot_general per x-slot: the whole slab lands in `order`
    (P, P) matmuls and ONE (order, P, P) window accumulation, instead of
    scap sequential brick RMWs;
  * the backward pass is the transpose: per slab, per x-slot o,
    M_o = WZ @ C_o^T and M'_o = dWZ @ C_o^T against the cotangent window
    C_o = gQ[b+o] give every atom's charge and position cotangents as
    row reductions -- no per-atom gathers at all.  The frac-derivative
    rows come from the same recursion one level down:
    dM_order(z-p) = M_{order-1}(z-p) - M_{order-1}(z-p-1).

Atom binning overflow (a slab holding more than scap atoms) is flagged by
`pme_slab_overflow` (a K-bin count -- no sort) and handled by the driver
exactly like neighbor-list / cell overflow: regrow the static capacity
(System.pme_scap) and rebuild.

Falls back to interpret mode off-TPU so CPU tests run the same code.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import pbc
from .pme_spread import _fold_halo, _pad_halo, _on_tpu


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
    """Slot of each atom in the (K*scap,) slab-major layout.

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
    slot_sorted = jnp.where(rank < scap, sorted_id * scap + rank, K * scap)
    slot = jnp.zeros((N,), jnp.int32).at[order].set(slot_sorted)
    return slot


def pme_slab_overflow(x, box, K, order, scap):
    """Standalone overflow probe: true iff any x-slab holds more than
    scap atoms.  A one-hot column count -- the old sort-based probe never
    CSE'd with the kernel's binning, and a scatter-add bincount measured
    ~0.09 ms/step (serialized)."""
    u = pbc.scaled_grid_coords(x, box, K)
    c1 = jnp.mod(jnp.floor(u[:, 0]) - (order - 1), K).astype(jnp.int32)
    counts = jnp.sum((c1[:, None] == jnp.arange(K, dtype=jnp.int32))
                     .astype(jnp.float32), axis=0)
    return jnp.any(counts > scap)


def _m2(y):
    return jnp.maximum(0.0, 1.0 - jnp.abs(y - 1.0))


def _weight_rows(z, width, order, deriv):
    """Dense spline rows M_order(z - p) over lane iota p = 0..width-1.

    z: (scap, 1).  Pointwise Cox-de Boor: tracks M_j(y - t) for the
    shifted arguments t = 0..order-j (M_j(y-t-1) is just the next entry),
    so no lane shifts are needed and all-zero pack rows yield all-zero
    weight rows (M_order vanishes outside (0, order)).  deriv=True also
    returns d/dfrac rows M_{order-1}(z-p) - M_{order-1}(z-p-1)."""
    scap = z.shape[0]
    f = z.dtype
    # int iota then convert: Mosaic's tpu.iota is integer-only
    y0 = z - jax.lax.broadcasted_iota(
        jnp.int32, (scap, width), 1).astype(f)
    ys = [y0 - t for t in range(order - 1)]
    vals = [_m2(yt) for yt in ys]
    dw = None
    for j in range(3, order + 1):
        if deriv and j == order:
            dw = vals[0] - vals[1]
        inv = 1.0 / (j - 1)
        vals = [(ys[t] * vals[t] + (j - ys[t]) * vals[t + 1]) * inv
                for t in range(order - j + 1)]
    return (vals[0], dw) if deriv else vals[0]


def _spread_slab_kernel(pack_ref, qp_ref, acc_ref, *, P, order, G, scap):
    """One program per GROUP of G consecutive x-slabs.

    The one-slab-per-program version was bound by its serial dependency
    chain: every program read-modify-writes an (order, P, P) window of
    the SAME accumulator that the previous program just wrote, so K
    programs execute as a K-deep latency chain.  Grouping G slabs per
    program accumulates locally into an (G+order-1, P, P) VMEM scratch
    (no cross-program dependence) and performs ONE window RMW per
    program -- the chain shrinks K -> K/G and the per-slab MXU dot is a
    single wide (scap, order*P) x (scap, P) contraction."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        qp_ref[...] = jnp.zeros(qp_ref.shape, qp_ref.dtype)

    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    for g in range(G):
        blk = pack_ref[g * scap:(g + 1) * scap, :]        # (scap, 8)
        wy = _weight_rows(blk[:, 1:2], P, order, False)   # (scap, P)
        wz = _weight_rows(blk[:, 2:3], P, order, False)
        wxq = _weight_rows(blk[:, 0:1], 8, order, False) * blk[:, 3:4]
        W6 = jnp.concatenate([wy * wxq[:, o:o + 1] for o in range(order)],
                             axis=1)                      # (scap, order*P)
        C = jax.lax.dot_general(
            W6, wz, (((0,), (0,)), ((), ())),
            preferred_element_type=qp_ref.dtype,
            precision=jax.lax.Precision.HIGHEST)          # (order*P, P)
        acc_ref[g:g + order, :, :] = (acc_ref[g:g + order, :, :]
                                      + C.reshape(order, P, P))
    span = G + order - 1
    window = qp_ref[pl.ds(b * G, span), :, :]
    qp_ref[pl.ds(b * G, span), :, :] = window + acc_ref[...]


def _spread_group(K):
    """Slabs per spread program: largest divisor of K among (8, 4, 2)."""
    for g in (8, 4, 2):
        if K % g == 0:
            return g
    return 1


def _interp_slab_kernel(pack_ref, win_ref, out_ref, *, P, order):
    """Backward: per slab, contract the cotangent window with the spline
    rows; outputs per-atom [gq, s1, s2, s3] (s = dE/du before the q and
    box-transform factors).

    The slab's `order` (P, P) cotangent windows are sliced IN-KERNEL from
    the VMEM-resident halo-padded cotangent grid at dynamic row start b
    (round 4: the former XLA-side (K, order*P, P) window stack was a
    ~7 MB copy per step), then the z-contraction is ONE MXU dot with wz
    and dwz stacked on the sublane axis."""
    blk = pack_ref[...]                               # (scap, 8)
    wy, dwy = _weight_rows(blk[:, 1:2], P, order, True)
    wz, dwz = _weight_rows(blk[:, 2:3], P, order, True)
    wx, dwx = _weight_rows(blk[:, 0:1], 8, order, True)

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
    b = pl.program_id(0)
    W = win_ref[pl.ds(b, order), :, :].reshape(order * P, P)
    wz2 = jnp.concatenate([wz, dwz], axis=0)          # (2*scap, P)
    # M2[u, (o, y)] = sum_z wz2_u(z) W[(o, y), z]
    M2 = jax.lax.dot_general(wz2, W, (((1,), (1,)), ((), ())),
                             preferred_element_type=f,
                             precision=hi)            # (2*scap, order*P)
    for o in range(order):
        M = M2[:scap, o * P:(o + 1) * P]              # (scap, P)
        Md = M2[scap:, o * P:(o + 1) * P]
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
    """(K*scap, 8) slab-major pack of [z1 z2 z3 q] (z = frac +
    (order-1) + corner; z1 omits its corner -- the slab id b IS c1),
    assembled by ONE slim row gather."""
    f = x.dtype
    N = x.shape[0]
    P = K + order - 1
    assert P <= 128, f"pme grid K={K} exceeds the slab kernel's lane width"
    u = pbc.scaled_grid_coords(x, box, K)
    nearpt = jnp.floor(u)
    frac = u - nearpt
    corner = jnp.mod(nearpt - (order - 1), K).astype(jnp.int32)
    base = jnp.asarray(order - 1, f)
    rows = jnp.stack(
        [frac[:, 0] + base,
         frac[:, 1] + base + corner[:, 1].astype(f),
         frac[:, 2] + base + corner[:, 2].astype(f),
         q], axis=1)                                   # (N, 4)
    rows = jnp.concatenate([rows, jnp.zeros((N, 4), f)], axis=1)
    slot = _bin_by_slab(corner[:, 0], K, scap)
    # inverse permutation (tiny int scatter), then one ROW GATHER: on TPU
    # the gather form beats the (K*scap, 8) row scatter
    gidx = jnp.full((K * scap + 1,), N, jnp.int32).at[slot].set(
        jnp.arange(N, dtype=jnp.int32))[:-1]
    rows_pad = jnp.concatenate([rows, jnp.zeros((1, 8), f)], axis=0)
    return rows_pad[gidx], slot


def _fwd(x, q, box, K, order, scap):
    f = x.dtype
    P = K + order - 1
    pack, slot = _build_pack(x, q, box, K, order, scap)

    G = _spread_group(K)
    qp = pl.pallas_call(
        functools.partial(_spread_slab_kernel, P=P, order=order, G=G,
                          scap=scap),
        grid=(K // G,),
        out_shape=jax.ShapeDtypeStruct((P, P, P), f),
        in_specs=[pl.BlockSpec((G * scap, 8), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((P, P, P), lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G + order - 1, P, P), f)],
        interpret=not _on_tpu(),
    )(pack)
    Q = _fold_halo(qp, K, order)
    return Q, (pack, slot, q, box)


def _bwd(K, order, scap, res, gQ):
    pack, slot, q, box = res
    f = gQ.dtype
    P = K + order - 1
    gqp = _pad_halo(gQ, K, order)
    # the kernel slices its own `order` overlapping cotangent windows from
    # the VMEM-resident (P, P, P) padded grid -- no XLA-side window stack
    out = pl.pallas_call(
        functools.partial(_interp_slab_kernel, P=P, order=order),
        grid=(K,),
        out_shape=jax.ShapeDtypeStruct((K * scap, 8), f),
        in_specs=[
            pl.BlockSpec((scap, 8), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # gqp (P, P, P)
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
