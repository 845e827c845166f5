"""Pallas TPU kernels: PME charge spreading / interpolation
(grid_Q pme.f90:184-264, derivative_grid_Q pme.f90:346-498).

The XLA lowering of the B-spline scatter-add issues order^3 (216) random
HBM updates per atom.  Here the padded charge grid stays resident in VMEM
(K=32, order 6 -> 37^3 fp32 = 203 KB) and each atom performs ONE
dynamic-slice accumulation of its (order,order,order) weight brick:

  * spline arithmetic (outer products, derivative contractions) runs in
    XLA outside the kernels -- Mosaic's vector layouts dislike tiny-axis
    broadcasts; the kernels are pure brick scatter (spread) and brick
    gather (interpolation);
  * grid indices (nearpt - k) mod K form a contiguous window; wraparound
    is handled by a (K+order-1)^3 padded grid whose halo is folded by
    cheap XLA adds;
  * registered as a custom VJP: the backward pass gathers the cotangent
    bricks and contracts them with analytic B-spline derivatives, mapped
    to cartesian forces by K * kk (pme.f90:485-495).

Falls back to interpret mode off-TPU (CPU tests run the same code).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import pbc


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _axis_weights(x, box, K, order):
    """Window-ordered per-axis weights, derivative weights, corners."""
    from ...ops.bspline import _mn_all
    u = pbc.scaled_grid_coords(x, box, K)
    nearpt = jnp.floor(u)
    frac = (u - nearpt).reshape(-1)
    w = _mn_all(frac, order).reshape(*u.shape, order)     # M_n(frac + j)
    m1 = _mn_all(frac, order - 1).reshape(*u.shape, order - 1)
    zeros = jnp.zeros(u.shape + (1,), u.dtype)
    m1e = jnp.concatenate([m1, zeros], axis=-1)
    m1s = jnp.concatenate([zeros, m1], axis=-1)
    dw = m1e - m1s                                        # M_n'(frac + j)
    # slot j is grid point nearpt - j; ascending grid order reverses j
    return (w[..., ::-1], dw[..., ::-1],
            jnp.mod(nearpt - (order - 1), K).astype(jnp.int32))


_BLK = 256      # atoms per grid step (bounds SMEM/VMEM block sizes)


def _spread_kernel(corner_ref, bricks_ref, qp_ref, *, blk, order):
    """Bricks span the full last (lane) axis: dynamic slicing along lanes
    is not allowed on TPU, so the third grid axis is materialized at full
    width with the weights pre-placed at their lane offset.  The atom axis
    is blocked by the grid; the output grid block is revisited (constant
    index map) and zeroed on the first step.  Padded atoms carry zero
    bricks, so no masking is needed."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        qp_ref[...] = jnp.zeros(qp_ref.shape, qp_ref.dtype)

    def body(a, _):
        c1 = corner_ref[a, 0]
        c2 = corner_ref[a, 1]
        blk_v = qp_ref[pl.ds(c1, order), pl.ds(c2, order), :]
        qp_ref[pl.ds(c1, order), pl.ds(c2, order), :] = \
            blk_v + bricks_ref[a]
        return 0

    jax.lax.fori_loop(0, blk, body, 0)


def _gather_kernel(corner_ref, grid_ref, out_ref, *, blk, order):
    def body(a, _):
        c1 = corner_ref[a, 0]
        c2 = corner_ref[a, 1]
        out_ref[a] = grid_ref[pl.ds(c1, order), pl.ds(c2, order), :]
        return 0

    jax.lax.fori_loop(0, blk, body, 0)


def _fold_halo(qp, K, order):
    h = order - 1
    q = qp[:K, :, :].at[:h, :, :].add(qp[K:, :, :])
    q = q[:, :K, :].at[:, :h, :].add(q[:, K:, :])
    q = q[:, :, :K].at[:, :, :h].add(q[:, :, K:])
    return q


def _pad_halo(grid, K, order):
    h = order - 1
    g = jnp.concatenate([grid, grid[:h, :, :]], axis=0)
    g = jnp.concatenate([g, g[:, :h, :]], axis=1)
    g = jnp.concatenate([g, g[:, :, :h]], axis=2)
    return g


def _pad_atoms(arr, n_pad):
    pad = [(0, n_pad - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad)


def _spread(bricks, corner, K, order):
    """bricks: (n, order, order, P) with the third-axis weights already
    placed at their lane offsets."""
    n = bricks.shape[0]
    P = K + order - 1
    n_blocks = -(-n // _BLK)
    bricks = _pad_atoms(bricks, n_blocks * _BLK)
    corner = _pad_atoms(corner, n_blocks * _BLK)
    qp = pl.pallas_call(
        functools.partial(_spread_kernel, blk=_BLK, order=order),
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((P, P, P), bricks.dtype),
        in_specs=[
            pl.BlockSpec((_BLK, 3), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLK, order, order, P), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, P, P), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(corner, bricks)
    return _fold_halo(qp, K, order)


def _gather(grid, corner, K, order):
    """Returns (n, order, order, P) full-lane bricks."""
    n = corner.shape[0]
    P = K + order - 1
    gp = _pad_halo(grid, K, order)
    n_blocks = -(-n // _BLK)
    corner_p = _pad_atoms(corner, n_blocks * _BLK)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, blk=_BLK, order=order),
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((n_blocks * _BLK, order, order, P),
                                       grid.dtype),
        in_specs=[
            pl.BlockSpec((_BLK, 3), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((P, P, P), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLK, order, order, P),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(corner_p, gp)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def charge_grid_pallas(x, q, box, K, order):
    """Drop-in replacement for models.pme.charge_grid."""
    return _charge_grid_fwd(x, q, box, K, order)[0]


def _lane_rows(vals, c3, P):
    """Place (n, order) third-axis weights at lane offset c3: (n, P)."""
    n, order = vals.shape
    lanes = jnp.arange(P, dtype=jnp.int32)[None, :]        # (1, P)
    row = jnp.zeros((n, P), vals.dtype)
    for k in range(order):
        row = row + jnp.where(lanes == (c3 + k)[:, None],
                              vals[:, k:k + 1], 0.0)
    return row


def _charge_grid_fwd(x, q, box, K, order):
    w, dw, corner = _axis_weights(x, box, K, order)
    P = K + order - 1
    row3 = _lane_rows(w[:, 2], corner[:, 2], P)            # (n, P)
    bricks = (q[:, None, None, None]
              * w[:, 0, :, None, None]
              * w[:, 1, None, :, None]
              * row3[:, None, None, :])
    Q = _spread(bricks, corner, K, order)
    return Q, (w, dw, corner, q, box)


def _charge_grid_bwd(K, order, res, gQ):
    w, dw, corner, q, box = res
    P = K + order - 1
    cot = _gather(gQ, corner, K, order)                   # (n, o, o, P)
    row3 = _lane_rows(w[:, 2], corner[:, 2], P)
    drow3 = _lane_rows(dw[:, 2], corner[:, 2], P)
    # value contraction -> dE/dq; derivative contractions -> dE/du
    # (HIGHEST precision: TPU einsums otherwise run bf16 multiply passes)
    hi = jax.lax.Precision.HIGHEST
    w1, w2 = w[:, 0], w[:, 1]
    d1, d2 = dw[:, 0], dw[:, 1]
    gq = jnp.einsum("aijl,ai,aj,al->a", cot, w1, w2, row3, precision=hi)
    s1 = jnp.einsum("aijl,ai,aj,al->a", cot, d1, w2, row3, precision=hi)
    s2 = jnp.einsum("aijl,ai,aj,al->a", cot, w1, d2, row3, precision=hi)
    s3 = jnp.einsum("aijl,ai,aj,al->a", cot, w1, w2, drow3, precision=hi)
    ds_du = q[:, None] * jnp.stack([s1, s2, s3], axis=-1)
    gx = K * (ds_du @ pbc.recip_vectors(box))
    return gx, gq, jnp.zeros_like(box)


charge_grid_pallas.defvjp(_charge_grid_fwd, _charge_grid_bwd)
