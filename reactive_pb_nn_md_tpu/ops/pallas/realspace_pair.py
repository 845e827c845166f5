"""Pallas TPU kernel: fused real-space nonbonded pair sweep.

Replaces the XLA (N, K) half-list pair path (models/total.realspace_inter)
for the hot inter-molecular erfc-Ewald + LJ/SAPT sum -- the TPU analog of
the reference's hottest OpenMP loop (pair_int_real_space.f90:183-327).

Design (TPU-first, not a translation):

  * atoms are binned into a static (nc1, nc2, nc3) cell grid sized by the
    REAL-SPACE cutoff and laid out cell-major as an (n_cells*ccap, 8)
    packed array [x y z q type mol 0 0]; empty slots hold a far-away
    sentinel position and mol = -1;
  * the kernel grid runs one program per cell; each program loads its own
    (ccap, 8) block plus the 27-cell stencil (static Python loop, dynamic
    ROW starts -- lane offsets stay static) into a component-major
    (8, 27*ccap) scratch, then evaluates the (ccap, J) pair block entirely
    in registers/VMEM: minimum image, cutoff/molecule/self masks,
    erfc-Ewald, and LJ or SAPT Buckingham with per-pair parameters from
    one-hot MXU contractions against the tiny (T, T) tables;
  * FULL stencil enumeration: every ordered pair appears in exactly one
    row program, so per-atom forces are pure row reductions -- the
    scatter-add transpose that dominated the XLA backward disappears;
    energies carry the 1/2 double-count factor;
  * forces are computed IN the forward pass from the analytic -dE/dr / r
    factors (the reference's "ewaldscale" forms, pair_int_real_space.f90:
    740-759, and the Tang-Toennies derivative identity f_n'(x) =
    e^-x x^n / n!); the custom VJP just scales the stored per-atom
    gradients -- no second pair sweep in the backward.

Falls back to interpret mode off-TPU so CPU tests exercise the same code.
Capacity overflow (a cell holding more than ccap atoms, or an NPT box
shrunk below one cutoff per cell) is reported as a flag; the driver
regrows exactly like neighbor-list overflow.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.constants import CONV_E2A_KJMOL, SQRT_PI


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


_SENTINEL = 1.0e6      # empty-slot position: far outside any cutoff


def _erfc_pos(x):
    """erfc(x) for x >= 0 (Mosaic has no erfc primitive).

    Abramowitz & Stegun 7.1.26 rational approximation, |error| <= 1.5e-7
    absolute -- the same accuracy class as the reference's 1e5-point
    interpolated erfc table (initialize_routines.f90:229-242) and ~2 ulp
    at fp32.  The force factor uses the EXACT derivative -2/sqrt(pi)
    e^{-x^2}; the <=2e-7 energy/force inconsistency is far below fp32
    integration noise (validated by tests/test_pallas_realspace.py)."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def suggest_rs_cells(n_atoms, box, cutoff, safety=1.5, min_atoms=192):
    """Static cell-grid config (nc1, nc2, nc3, ccap) for the fused pair
    kernel, or () when the grid degenerates (tiny/non-cubic boxes).

    Sized by the REAL-SPACE cutoff (the kernel re-binds every step, so no
    skin is needed).  ccap is padded to a multiple of 8 (fp32 sublanes)."""
    if n_atoms < min_atoms:
        return ()
    b = np.asarray(box, dtype=np.float64)
    if np.abs(b - np.diag(np.diag(b))).max() > 1e-9:
        return ()                       # orthorhombic only
    widths = np.diag(b)
    nc = [int(w // cutoff) for w in widths]
    if min(nc) < 3:
        return ()
    per_cell = n_atoms / (nc[0] * nc[1] * nc[2])
    cap = max(per_cell * safety, per_cell + 4.0 * np.sqrt(per_cell))
    ccap = int(-(-int(np.ceil(cap)) // 8) * 8)
    return (nc[0], nc[1], nc[2], max(ccap, 8))


def _stencil_ids(cells):
    """(n_cells, 27) neighbor cell ids (static; grid dims are static)."""
    nc1, nc2, nc3, _ = cells
    ids = np.arange(nc1 * nc2 * nc3)
    ci = np.stack([ids // (nc2 * nc3), (ids // nc3) % nc2, ids % nc3],
                  axis=1)
    off = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                    for k in (-1, 0, 1)])
    nb = (ci[:, None, :] + off[None, :, :]) % np.array([nc1, nc2, nc3])
    return ((nb[..., 0] * nc2 + nb[..., 1]) * nc3
            + nb[..., 2]).astype(np.int32)


def _bin_atoms(x, box, cells):
    """Cell assignment + cell-major slot layout.  Returns (slot (N,),
    overflow ()); slot is the row of each atom in the packed array."""
    nc1, nc2, nc3, ccap = cells
    N = x.shape[0]
    ncv = jnp.array([nc1, nc2, nc3], jnp.int32)
    L = jnp.diagonal(box)
    frac = x / L[None, :]
    frac = frac - jnp.floor(frac)
    ci = jnp.clip((frac * ncv).astype(jnp.int32), 0, ncv - 1)
    cell_id = (ci[:, 0] * nc2 + ci[:, 1]) * nc3 + ci[:, 2]

    order = jnp.argsort(cell_id).astype(jnp.int32)
    sorted_id = cell_id[order]
    ar = jnp.arange(N, dtype=jnp.int32)
    first = jnp.concatenate([jnp.array([True]),
                             sorted_id[1:] != sorted_id[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, ar, 0))
    rank = ar - run_start
    overflow = jnp.any(rank >= ccap)

    # slot of atom order[k] is sorted_id[k]*ccap + rank[k]
    slot_sorted = jnp.where(rank < ccap, sorted_id * ccap + rank,
                            nc1 * nc2 * nc3 * ccap)      # dump row
    slot = jnp.zeros((N,), jnp.int32).at[order].set(slot_sorted)

    # kernel validity: every cell must still span >= cutoff (NPT shrink)
    return slot, overflow


def _kernel(nbr_ref, cm_ref, cmt_ref, tabs_ref, par_ref, f_ref, scratch,
            *, ccap, T, n_tab, has_sapt):
    """One program per cell.

    nbr_ref  : (n_cells, 27) scalar-prefetch stencil ids
    cm_ref   : (n_cells*ccap, 8) packed cell-major atom data (VMEM)
    cmt_ref  : (n_cells, 8, ccap) the SAME data component-major (VMEM);
               pre-transposed ONCE in XLA so the stencil loads below are
               plain dynamic-row copies -- the earlier in-kernel blk.T
               re-transposed every cell 27x (once per neighboring
               program), which dominated the kernel's runtime
    tabs_ref : (n_tab, T, T) parameter tables (VMEM)
    par_ref  : (1, 8) float params [Lx Ly Lz rcut2 alpha conv 0 0] (SMEM)
    f_ref    : (ccap, 8) per-atom [gx_el gy gz gx_vdw gy gz e_el e_vdw]
               = dE/dx plus the cell's energy partial sums spread over the
               two spare lanes (TPU blocks need 8-divisible sublanes, so a
               separate (1, 2) energy output is not lowerable)
    scratch  : (8, J) component-major stencil data
    """
    c = pl.program_id(0)
    J = scratch.shape[1]
    f32 = cm_ref.dtype

    # ---- gather the 27 stencil blocks (static lane offsets, dynamic
    # leading-dim rows, no transposes)
    for k in range(27):
        nb = nbr_ref[c, k]
        scratch[:, k * ccap:(k + 1) * ccap] = cmt_ref[nb]  # (8, ccap)

    own = cm_ref[pl.ds(c * ccap, ccap), :]                 # (ccap, 8)

    Lx = par_ref[0, 0]
    Ly = par_ref[0, 1]
    Lz = par_ref[0, 2]
    rcut2 = par_ref[0, 3]
    alpha = par_ref[0, 4]
    conv = par_ref[0, 5]

    # ---- minimum-image pair distances, (ccap, J)
    def mi(d, L):
        return d - L * jnp.round(d * (1.0 / L))

    dx = mi(own[:, 0:1] - scratch[0:1, :], Lx)
    dy = mi(own[:, 1:2] - scratch[1:2, :], Ly)
    dz = mi(own[:, 2:3] - scratch[2:3, :], Lz)
    r2 = dx * dx + dy * dy + dz * dz

    mol_i = own[:, 5:6]
    mol_j = scratch[5:6, :]
    # self-pair: same packed slot (row) id
    gid_i = (c * ccap
             + jax.lax.broadcasted_iota(jnp.int32, (ccap, 1), 0))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, J), 1)
    nb_of_lane = lane // ccap                              # 0..26 (pad->26+)
    gid_j = jnp.zeros((1, J), jnp.int32)
    for k in range(27):
        nb = nbr_ref[c, k]
        gid_j = jnp.where(nb_of_lane == k,
                          nb * ccap + lane - k * ccap, gid_j)
    valid_j = (lane < 27 * ccap) & (mol_j >= 0.0)
    within = ((r2 < rcut2) & (mol_i != mol_j) & (mol_i >= 0.0)
              & valid_j & (gid_i != gid_j))

    r2s = jnp.where(within, r2, 1.0)
    inv_r2 = 1.0 / r2s
    r = jnp.sqrt(r2s)
    inv_r = 1.0 / r

    # ---- erfc Ewald energy + force factor (pairwise_real_space_ewald)
    qq = (own[:, 3:4] * scratch[3:4, :]) * conv
    ar = alpha * r
    erfc_ar = _erfc_pos(ar)
    gauss = jnp.exp(-ar * ar)
    e_el_pair = qq * erfc_ar * inv_r
    # S = -(1/r) dE/dr  (force = S * dr_vec on atom i)
    two_a_pi = 2.0 * alpha / SQRT_PI
    s_el = qq * (erfc_ar * inv_r + two_a_pi * gauss) * inv_r2

    # ---- vdW parameters via one-hot MXU contractions
    ti = own[:, 4:5]
    tj = scratch[4:5, :]
    tt_i = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(f32)
    tt_j = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0).astype(f32)
    oh_i = (ti == tt_i).astype(f32)                        # (ccap, T)
    oh_j = (tj == tt_j).astype(f32)                        # (T, J)

    def pair_tab(k):
        m = jnp.dot(tabs_ref[k], oh_j, preferred_element_type=f32)
        return jnp.dot(oh_i, m, preferred_element_type=f32)

    vt = pair_tab(0)                                       # -1 none/0 LJ/1 SAPT
    c12 = pair_tab(1)
    c6 = pair_tab(2)

    inv_r6 = inv_r2 * inv_r2 * inv_r2
    inv_r12 = inv_r6 * inv_r6
    is_lj = vt == 0.0
    e_vdw_pair = jnp.where(is_lj, c12 * inv_r12 - c6 * inv_r6, 0.0)
    s_vdw = jnp.where(is_lj,
                      (12.0 * c12 * inv_r12 - 6.0 * c6 * inv_r6) * inv_r2,
                      0.0)

    if has_sapt:
        A = pair_tab(3)
        B = pair_tab(4)
        Cs = [c6, pair_tab(5), pair_tab(6), pair_tab(7)]   # C6 C8 C10 C12
        x_tt = jnp.minimum(B * r, 40.0)
        ex = jnp.exp(-x_tt)
        e_s = A * ex
        s_s = A * B * ex * inv_r
        # f_n(x) = 1 - e^-x sum_k x^k/k!; f_n'(x) = e^-x x^n/n!
        term = jnp.ones_like(x_tt)
        ssum = jnp.ones_like(x_tt)
        inv_rn = inv_r6
        fact = 1.0
        for n in range(1, 13):
            fact = fact * n
            term = term * x_tt
            ssum = ssum + term / fact
            if n in (6, 8, 10, 12):
                fn = 1.0 - ssum * ex
                dfn = ex * term / fact                    # f_n'(x)
                Cn = Cs[(n - 6) // 2]
                e_s = e_s - fn * Cn * inv_rn
                s_s = s_s + (B * dfn * Cn * inv_rn
                             - n * fn * Cn * inv_rn * inv_r) * inv_r
                inv_rn = inv_rn * inv_r2
        is_sapt = vt == 1.0
        e_vdw_pair = jnp.where(is_sapt, e_s, e_vdw_pair)
        s_vdw = jnp.where(is_sapt, s_s, s_vdw)

    zero = jnp.zeros_like(e_el_pair)
    e_el_pair = jnp.where(within, e_el_pair, zero)
    e_vdw_pair = jnp.where(within, e_vdw_pair, zero)
    s_el = jnp.where(within, s_el, zero)
    s_vdw = jnp.where(within, s_vdw, zero)
    # scratch lanes beyond 27*ccap are uninitialized: zero the displacement
    # components too, or 0 * NaN poisons the force row sums
    dx = jnp.where(within, dx, zero)
    dy = jnp.where(within, dy, zero)
    dz = jnp.where(within, dz, zero)

    # dE/dx_i = -sum_j S * dr_vec  (S = -(1/r) dE/dr); the cell's energy
    # partial sums ride in the two spare lanes as per-row partials
    f_ref[...] = jnp.concatenate(
        [-jnp.sum(s_el * dx, axis=1, keepdims=True),
         -jnp.sum(s_el * dy, axis=1, keepdims=True),
         -jnp.sum(s_el * dz, axis=1, keepdims=True),
         -jnp.sum(s_vdw * dx, axis=1, keepdims=True),
         -jnp.sum(s_vdw * dy, axis=1, keepdims=True),
         -jnp.sum(s_vdw * dz, axis=1, keepdims=True),
         0.5 * jnp.sum(e_el_pair, axis=1, keepdims=True),
         0.5 * jnp.sum(e_vdw_pair, axis=1, keepdims=True)], axis=1)


def _build_tabs(system, dtype):
    """Stacked (n_tab, T, T) parameter tables: vdw_type, C12, C6 [, A, B,
    C8, C10, C12_sapt].  LJ params live in vdw_params[..., 0:2]; SAPT in
    vdw_params[..., 0:6] = A B C6 C8 C10 C12 (io/ffpmt.py layout)."""
    ff = system.ff
    vt = ff.vdw_type.astype(dtype)
    p = ff.vdw_params.astype(dtype)
    is_lj = ff.vdw_type == 0
    c12 = jnp.where(is_lj, p[..., 0], 0.0)
    c6 = jnp.where(is_lj, p[..., 1], p[..., 2])   # SAPT C6 shares slot 2
    tabs = [vt, c12, c6]
    if system.has_sapt:
        tabs += [p[..., 0], p[..., 1], p[..., 3], p[..., 4], p[..., 5]]
    return jnp.stack(tabs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def realspace_inter_cells(x, charge, atype, mol, box, tabs, cells, consts):
    """(e_elec, e_vdw) over all inter-molecular pairs within the cutoff.

    tabs: stacked (n_tab, T, T) tables from _build_tabs; cells: static
    (nc1, nc2, nc3, ccap); consts: static (rcut, alpha, has_sapt, T).
    charge/atype/mol must be FLOAT arrays.  Differentiable in x only
    (other cotangents are zero -- the MD force path differentiates
    positions; matches the XLA path's use)."""
    e_el, e_vdw, _, _ = _forward(x, charge, atype, mol, box, tabs, cells,
                                 consts)
    return e_el, e_vdw


def rs_cell_overflow(x, box, cells, cutoff):
    """Standalone overflow probe (a cell fuller than ccap, or an NPT box
    shrunk below one cutoff per cell) -- cheap XLA, no kernel launch;
    XLA CSEs the binning with the kernel's own."""
    nc1, nc2, nc3, _ = cells
    _, over = _bin_atoms(x, box, cells)
    widths = jnp.diagonal(box) / jnp.array([nc1, nc2, nc3], x.dtype)
    return over | jnp.any(widths < cutoff)


def _forward(x, charge, atype, mol, box, tabs, cells, consts):
    nc1, nc2, nc3, ccap = cells
    rcut, alpha, has_sapt, T = consts
    n_tab = tabs.shape[0]
    n_cells = nc1 * nc2 * nc3
    f = x.dtype
    N = x.shape[0]

    slot, overflow = _bin_atoms(x, box, cells)

    C8 = n_cells * ccap
    base = jnp.full((C8 + 1, 8), 0.0, f).at[:, 0:3].set(_SENTINEL)
    base = base.at[:, 5].set(-1.0)
    vals = jnp.concatenate(
        [x, charge[:, None].astype(f), atype[:, None].astype(f),
         mol[:, None].astype(f), jnp.zeros((N, 2), f)], axis=1)
    cm = base.at[slot].set(vals)[:C8]
    # component-major copy for the kernel's stencil loads (ONE XLA
    # relayout here instead of 27 in-kernel transposes per cell)
    cmt = cm.reshape(n_cells, ccap, 8).transpose(0, 2, 1)

    nbr = jnp.asarray(_stencil_ids(cells))
    tabs = tabs.astype(f)
    L = jnp.diagonal(box).astype(f)
    par = jnp.array([[0.0] * 8], f).at[0, 0:3].set(L)
    par = par.at[0, 3].set(rcut * rcut).at[0, 4].set(alpha)
    par = par.at[0, 5].set(CONV_E2A_KJMOL)

    J = 27 * ccap
    Jpad = -(-J // 128) * 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # cm
            pl.BlockSpec(memory_space=pltpu.VMEM),          # cmt
            pl.BlockSpec(memory_space=pltpu.VMEM),          # tabs
            pl.BlockSpec((1, 8), lambda c, *_: (0, 0),
                         memory_space=pltpu.SMEM),          # par
        ],
        out_specs=pl.BlockSpec((ccap, 8), lambda c, *_: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, Jpad), f)],
    )
    f_cells = pl.pallas_call(
        functools.partial(_kernel, ccap=ccap, T=T, n_tab=n_tab,
                          has_sapt=has_sapt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C8, 8), f),
        interpret=not _on_tpu(),
    )(nbr, cm, cmt, tabs, par)

    e_el = jnp.sum(f_cells[:, 6])
    e_vdw = jnp.sum(f_cells[:, 7])
    fpad = jnp.concatenate([f_cells, jnp.zeros((1, 8), f)], axis=0)
    g = fpad[slot]                                         # (N, 8)
    return e_el, e_vdw, (g[:, 0:3], g[:, 3:6]), overflow


def _fwd_vjp(x, charge, atype, mol, box, tabs, cells, consts):
    e_el, e_vdw, (g_el, g_vdw), _ = _forward(
        x, charge, atype, mol, box, tabs, cells, consts)
    return (e_el, e_vdw), (g_el, g_vdw, tabs.shape)


def _bwd_vjp(cells, consts, res, cot):
    g_el, g_vdw, tabs_shape = res
    ge, gv = cot
    gx = ge * g_el + gv * g_vdw
    n = (g_el.shape[0],)
    z = jnp.zeros
    return (gx, z(n, gx.dtype), z(n, gx.dtype), z(n, gx.dtype),
            z((3, 3), gx.dtype), z(tabs_shape, gx.dtype))


realspace_inter_cells.defvjp(_fwd_vjp, _bwd_vjp)
