"""Pallas TPU kernel: fused per-diabat reciprocal-space delta energies.

models/pme.recip_delta_perstate computes, for every diabat s,

    E_s = sum_m cbw(m) [ Re(F0*(m) G_s(m)) + 1/2 |G_s(m)|^2 ],
    G_s(m1, m23) = sum_u dq_su A_u(m1) BC_u(m23),

by materializing the (S, K, K, Kh) delta spectrum G in HBM (a 35 MB
round-trip at K=64 / S=32, plus the same again for dG in the force
backward).  This kernel streams G through VMEM in m1-row blocks and never
writes it out: each program computes a (blk*S, Mp) spectrum block as MXU
matmuls (bf16x3 passes -- exactly the lax.Precision.HIGH contraction the
XLA path uses) and reduces it against cbw / F0 in place.  The custom VJP
recomputes the block and contracts the in-register cotangent spectrum
back onto (dq, A, BC, F0) without spilling either.

Inputs are the SPLIT real/imag parts of the complex factors so the
custom_vjp boundary stays real-valued (JAX's complex-cotangent convention
never enters); the caller composes them from structure_axis_factors and
autodiff continues cleanly through to atom positions.

Falls back to interpret mode off-TPU; models/pme dispatches to this kernel
only on the TPU fp32 path (the fp64 CPU path keeps the XLA formulation,
which tests/test_delta_diag.py pins to the batched-FFT ground truth).

Reference lineage: the TPU endpoint of the incremental per-diabat PME idea
(ms_evb.f90:1962-2095, modify_Q_grid pme.f90:275-335).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _dot3(a, b, dims=(((1,), (0,)), ((), ()))):
    """f32 matmul as three bf16 passes with f32 accumulation -- the same
    ~21-bit-mantissa contraction as lax.Precision.HIGH (Mosaic kernel dots
    only support DEFAULT / HIGHEST; HIGHEST doubles the pass count)."""
    f = a.dtype
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(f)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(f)).astype(jnp.bfloat16)

    def d(x, y):
        # explicit DEFAULT: the engine-wide jax_default_matmul_precision
        # = float32 pin would otherwise stamp fp32 contract precision on
        # these bf16 operands, which Mosaic rejects
        return jax.lax.dot_general(x, y, dims, preferred_element_type=f,
                                   precision=jax.lax.Precision.DEFAULT)

    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _blk(K, S, Mp):
    """m1 rows per program: 8 (the TPU sublane quantum -- smaller (blk,
    Mp) input blocks violate Mosaic's 8-sublane block rule) or K itself
    for tiny grids.  VMEM is bounded instead by chunking the STATE axis
    at the caller (models/pme.recip_delta_perstate): the live (blk*S,
    Mp) gr/gi blocks dominate scoped VMEM, and blk*S*Mp <= 8*32*2176 is
    the measured-good envelope (S=80, K=64 at one chunk exceeded the
    16 MB scoped-vmem limit by 5.3 MB at compile time)."""
    return 8 if K % 8 == 0 else K


MAX_BLOCK_ELEMS = 8 * 32 * 2176   # the known-good blk*S*Mp envelope


def _g_block(w, bcr, bci, S, blk):
    """(blk*S, Mp) spectrum block from the packed [Wr | Wi] rows."""
    B = blk * S
    wr, wi = w[:B], w[B:]
    gr = _dot3(wr, bcr) - _dot3(wi, bci)
    gi = _dot3(wr, bci) + _dot3(wi, bcr)
    return wr, wi, gr, gi


def _fwd_kernel(w_ref, bcr_ref, bci_ref, f0r_ref, f0i_ref, cbw_ref,
                out_ref, *, S, blk):
    """One program per m1 block.

    w_ref   : (2*blk*S, U) rows = [Wr | Wi], W[m1-major, s] = dq_su A_u(m1)
    bcr/bci : (U, Mp) axis-factor products (resident across programs)
    f0r/f0i : (blk, Mp) base-spectrum rows
    cbw     : (blk, Mp) CB weights (zero on lane padding)
    out     : (S, blk) per-(state, m1-of-block) energy partials
    """
    b = pl.program_id(0)
    _, _, gr, gi = _g_block(w_ref[...], bcr_ref[...], bci_ref[...], S, blk)
    # out is the FULL (S, K) block (per-block lane slices violate the
    # (8, 128) tiling rule): program b adds its blk columns by lane-iota
    # select and accumulates across the sequential grid
    K = out_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)
    acc = jnp.zeros((S, K), gr.dtype)
    for l in range(blk):
        grl = gr[l * S:(l + 1) * S]
        gil = gi[l * S:(l + 1) * S]
        cb = cbw_ref[l:l + 1, :]
        t = cb * (f0r_ref[l:l + 1, :] * grl
                  + f0i_ref[l:l + 1, :] * gil
                  + 0.5 * (grl * grl + gil * gil))
        acc = acc + jnp.where(lane == b * blk + l,
                              jnp.sum(t, axis=1, keepdims=True), 0.0)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, gr.dtype)

    out_ref[...] = out_ref[...] + acc


def _bwd_kernel(gbar_ref, w_ref, ar_ref, ai_ref, dq_ref,
                bcr_ref, bci_ref, f0r_ref, f0i_ref, cbw_ref,
                ddq_ref, dar_ref, dai_ref, dbcr_ref, dbci_ref,
                df0r_ref, df0i_ref, *, S, blk):
    """Backward: recompute the G block, form dG = gbar * cbw * (F0 + G),
    and contract it onto every differentiable input.

    gbar (S, 1) per-state cotangents; ddq (S, U) and dbcr/dbci (U, Mp)
    accumulate across the sequential grid; dar/dai (blk, U) and
    df0r/df0i (blk, Mp) are per-block rows."""
    b = pl.program_id(0)
    f = w_ref.dtype
    bcr = bcr_ref[...]
    bci = bci_ref[...]
    wr, wi, gr, gi = _g_block(w_ref[...], bcr, bci, S, blk)
    gbar = gbar_ref[...]                                   # (S, 1)
    gsum = jnp.sum(gbar)
    Mp = bcr.shape[1]
    rsel_m = jax.lax.broadcasted_iota(jnp.int32, (blk, Mp), 0)

    # dG rows (blk*S, Mp), assembled per m1 row; dF0 rows on the way
    # (full-block where-accumulation -- Mosaic-safe, no 1-D row stores)
    dgr_parts, dgi_parts = [], []
    df0r = jnp.zeros((blk, Mp), f)
    df0i = jnp.zeros((blk, Mp), f)
    for l in range(blk):
        sl = slice(l * S, (l + 1) * S)
        cb = cbw_ref[l:l + 1, :]
        dgr_l = gbar * (cb * (f0r_ref[l:l + 1, :] + gr[sl]))
        dgi_l = gbar * (cb * (f0i_ref[l:l + 1, :] + gi[sl]))
        dgr_parts.append(dgr_l)
        dgi_parts.append(dgi_l)
        # dF0 = sum_s gbar cbw G = sum_s dG - (sum_s gbar) cbw F0
        df0r = df0r + jnp.where(
            rsel_m == l,
            jnp.sum(dgr_l, axis=0, keepdims=True)
            - gsum * cb * f0r_ref[l:l + 1, :], 0.0)
        df0i = df0i + jnp.where(
            rsel_m == l,
            jnp.sum(dgi_l, axis=0, keepdims=True)
            - gsum * cb * f0i_ref[l:l + 1, :], 0.0)
    df0r_ref[...] = df0r
    df0i_ref[...] = df0i
    dgr = jnp.concatenate(dgr_parts, axis=0) if blk > 1 else dgr_parts[0]
    dgi = jnp.concatenate(dgi_parts, axis=0) if blk > 1 else dgi_parts[0]

    # dW: P1 = dE/dWr = dGr BCr^T + dGi BCi^T; P2 = dE/dWi = dGi BCr^T -
    # dGr BCi^T   (contract the Mp lane axis)
    lanes = (((1,), (1,)), ((), ()))
    p1 = _dot3(dgr, bcr, lanes) + _dot3(dgi, bci, lanes)   # (blk*S, U)
    p2 = _dot3(dgi, bcr, lanes) - _dot3(dgr, bci, lanes)

    dq = dq_ref[...]                                       # (S, U)
    U = dq.shape[1]
    rsel_u = jax.lax.broadcasted_iota(jnp.int32, (blk, U), 0)
    ddq = jnp.zeros(ddq_ref.shape, f)
    dar = jnp.zeros((blk, U), f)
    dai = jnp.zeros((blk, U), f)
    for l in range(blk):
        sl = slice(l * S, (l + 1) * S)
        ddq = ddq + p1[sl] * ar_ref[l:l + 1, :] \
            + p2[sl] * ai_ref[l:l + 1, :]
        dar = dar + jnp.where(
            rsel_u == l, jnp.sum(dq * p1[sl], axis=0, keepdims=True), 0.0)
        dai = dai + jnp.where(
            rsel_u == l, jnp.sum(dq * p2[sl], axis=0, keepdims=True), 0.0)
    dar_ref[...] = dar
    dai_ref[...] = dai

    # dBC: contract the row axis of W against dG
    rows = (((0,), (0,)), ((), ()))
    dbcr = _dot3(wr, dgr, rows) + _dot3(wi, dgi, rows)     # (U, Mp)
    dbci = _dot3(wr, dgi, rows) - _dot3(wi, dgr, rows)

    @pl.when(b == 0)
    def _():
        ddq_ref[...] = jnp.zeros(ddq_ref.shape, f)
        dbcr_ref[...] = jnp.zeros(dbcr_ref.shape, f)
        dbci_ref[...] = jnp.zeros(dbci_ref.shape, f)

    ddq_ref[...] = ddq_ref[...] + ddq
    dbcr_ref[...] = dbcr_ref[...] + dbcr
    dbci_ref[...] = dbci_ref[...] + dbci


def _pack_w(dq, ar, ai, blk, K):
    """Per-block [Wr | Wi] row pack: (K//blk * 2*blk*S, U)."""
    S, U = dq.shape
    wr = dq[None, :, :] * ar[:, None, :]                  # (K, S, U)
    wi = dq[None, :, :] * ai[:, None, :]
    g = K // blk
    wr = wr.reshape(g, blk * S, U)
    wi = wi.reshape(g, blk * S, U)
    return jnp.concatenate([wr, wi], axis=1).reshape(g * 2 * blk * S, U)


@jax.custom_vjp
def perstate_recip_energy(dq, ar, ai, bcr, bci, f0r, f0i, cbw):
    """(S,) per-state reciprocal delta energies (unscaled by CONV):
    E_s = sum_m cbw [F0r Gr + F0i Gi + (Gr^2 + Gi^2)/2].

    dq (S, U); ar/ai (K, U); bcr/bci (U, Mp); f0r/f0i/cbw (K, Mp).
    Mp is K*(K//2+1) zero-padded to a lane multiple by the caller; S must
    be a multiple of 8.  cbw gets a zero cotangent (the engine never
    differentiates wrt the box through the spectrum)."""
    return _fwd(dq, ar, ai, bcr, bci, f0r, f0i, cbw)[0]


def _fwd(dq, ar, ai, bcr, bci, f0r, f0i, cbw):
    S, U = dq.shape
    K, Mp = f0r.shape
    f = dq.dtype
    blk = _blk(K, S, Mp)
    g = K // blk
    w = _pack_w(dq, ar, ai, blk, K)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, S=S, blk=blk),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((2 * blk * S, U), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),           # bcr
            pl.BlockSpec(memory_space=pltpu.VMEM),           # bci
            pl.BlockSpec((blk, Mp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # f0r
            pl.BlockSpec((blk, Mp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # f0i
            pl.BlockSpec((blk, Mp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # cbw
        ],
        out_specs=pl.BlockSpec((S, K), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, K), f),
        interpret=not _on_tpu(),
    )(w, bcr, bci, f0r, f0i, cbw)
    e = jnp.sum(out, axis=1)
    return e, (dq, ar, ai, bcr, bci, f0r, f0i, cbw, w)


def _bwd(res, gbar):
    dq, ar, ai, bcr, bci, f0r, f0i, cbw, w = res
    S, U = dq.shape
    K, Mp = f0r.shape
    f = dq.dtype
    blk = _blk(K, S, Mp)
    g = K // blk
    gb = gbar.astype(f)[:, None]                           # (S, 1)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, S=S, blk=blk),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((S, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),           # gbar
            pl.BlockSpec((2 * blk * S, U), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # w
            pl.BlockSpec((blk, U), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # ar
            pl.BlockSpec((blk, U), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # ai
            pl.BlockSpec(memory_space=pltpu.VMEM),           # dq
            pl.BlockSpec(memory_space=pltpu.VMEM),           # bcr
            pl.BlockSpec(memory_space=pltpu.VMEM),           # bci
            pl.BlockSpec((blk, Mp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # f0r
            pl.BlockSpec((blk, Mp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # f0i
            pl.BlockSpec((blk, Mp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # cbw
        ],
        out_specs=[
            pl.BlockSpec((S, U), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),           # ddq (accum)
            pl.BlockSpec((blk, U), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # dar
            pl.BlockSpec((blk, U), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # dai
            pl.BlockSpec((U, Mp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),           # dbcr (accum)
            pl.BlockSpec((U, Mp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),           # dbci (accum)
            pl.BlockSpec((blk, Mp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # df0r
            pl.BlockSpec((blk, Mp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # df0i
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, U), f),
            jax.ShapeDtypeStruct((K, U), f),
            jax.ShapeDtypeStruct((K, U), f),
            jax.ShapeDtypeStruct((U, Mp), f),
            jax.ShapeDtypeStruct((U, Mp), f),
            jax.ShapeDtypeStruct((K, Mp), f),
            jax.ShapeDtypeStruct((K, Mp), f),
        ],
        interpret=not _on_tpu(),
    )(gb, w, ar, ai, dq, bcr, bci, f0r, f0i, cbw)
    ddq, dar, dai, dbcr, dbci, df0r, df0i = outs
    return (ddq, dar, dai, dbcr, dbci, df0r, df0i,
            jnp.zeros_like(cbw))


perstate_recip_energy.defvjp(_fwd, _bwd)
