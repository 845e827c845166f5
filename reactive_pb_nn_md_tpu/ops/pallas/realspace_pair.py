"""Pallas TPU kernel: fused real-space nonbonded pair sweep.

Replaces the XLA (N, K) half-list pair path (models/total.realspace_inter)
for the hot inter-molecular erfc-Ewald + LJ/SAPT sum -- the TPU analog of
the reference's hottest OpenMP loop (pair_int_real_space.f90:183-327).

Design (TPU-first, not a translation):

  * atoms are binned into a static (nc1, nc2, nc3) cell grid sized by the
    REAL-SPACE cutoff and laid out component-major as an
    (n_cells, 8, ccap) packed array [x y z q type mol 0 0]; empty slots
    hold a far-away sentinel position and mol = -1;
  * the kernel grid runs one program per cell; stencil cell ids are pure
    index arithmetic of the program id (a prefetched (n_cells, 27) table
    was lane-padded to 128 in SMEM -- 5.4 MB at 10^5 atoms, over the 1 MB
    SMEM budget); each program loads the stencil blocks (dynamic ROW
    starts, static lane offsets) into a component-major (8, S*ccap)
    scratch, then evaluates the (ccap, J) pair block entirely in
    registers/VMEM: minimum image, cutoff/molecule/self masks, erfc-Ewald,
    and LJ or SAPT Buckingham with per-pair parameters from one-hot MXU
    contractions against the tiny (T, T) tables;
  * HALF stencil enumeration (default): the self cell (upper-triangle
    masked) plus the 13 lexicographically-positive neighbors -- every
    unordered pair is evaluated ONCE, halving the candidate math of the
    full 27-stencil.  The i-side force is a row reduction as before; the
    j-side partial of stencil block k is a column reduction written to a
    per-offset output at block index (cell + offset_k) -- an arithmetic
    output index map, so no scatter and no cross-program accumulation --
    and XLA sums the 14 per-offset arrays (one cheap elementwise add);
  * the FULL 27-stencil path (set_stencil_impl("full")) keeps every
    ordered pair in one row program: forces are pure row reductions and
    energies carry the 1/2 double-count factor; retained as the A/B
    reference for the half path;
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

_STENCIL_IMPL = "auto"          # "auto" | "half" | "full" | "column"
# measured crossover (v5e, fwd+grad): 64 cells full wins 0.40 vs 0.60 ms,
# 343 cells half wins 0.81 vs 0.90, 1000 cells half wins 2.06 vs 2.50 --
# the j-side machinery is per-program fixed cost, the candidate-math
# saving scales with J.  The COLUMN walk (round 4) processes a whole
# z-column of cells per program: 10x fewer programs, the 14 tiny
# (8, ccap) stencil DMAs per cell become 5 (8, Z*ccap) column loads per
# program, and the 13 per-offset j-side outputs become 4 per-column
# outputs -- attacking the per-program/DMA overhead that dominates the
# kernel at 10^4 atoms (measured 1.68 us/program against ~0.2 us of VPU
# candidate math).
_HALF_MIN_CELLS = 200


def set_stencil_impl(impl):
    """Select the stencil enumeration: "auto" (default; column for grids
    of >= _HALF_MIN_CELLS cells, else full), "half", "full", "column".
    Takes effect at trace time (re-jit after switching)."""
    global _STENCIL_IMPL
    assert impl in ("auto", "half", "full", "column"), impl
    _STENCIL_IMPL = impl


def _impl_for(cells):
    if _STENCIL_IMPL == "auto":
        big = cells[0] * cells[1] * cells[2] >= _HALF_MIN_CELLS
        # measured at 10k atoms (v5e, fwd+grad): column 2.50 ms vs half
        # 2.94 vs full 3.35 -- the column walk's fewer programs + bigger
        # DMAs win at scale; small grids keep the single-cell full path
        return "column" if big else "full"
    return _STENCIL_IMPL


def _use_half(cells):
    return _impl_for(cells) == "half"


def _offsets(half):
    """Static stencil offsets.  half: self first, then the 13
    lexicographically-positive offsets (distinct mod the grid for nc >= 3
    since every component is in {-1, 0, 1})."""
    off = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
           for k in (-1, 0, 1)]
    if half:
        return [(0, 0, 0)] + [o for o in off if o > (0, 0, 0)]
    return off


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
    ccap = max(ccap, 8)
    # scoped-VMEM ceiling: the kernel's resident component-major blocks
    # scale with n_cells * ccap (measured: 22^3 cells x ccap 24 wanted
    # 41.7 MB against the 16 MB scoped limit at ~164 B/unit).  Beyond the
    # budget the XLA half-list path takes over (~10^5-atom boxes).
    if nc[0] * nc[1] * nc[2] * ccap > 80_000:
        return ()
    return (nc[0], nc[1], nc[2], ccap)


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


def _nb_of(c, o, cells):
    """Stencil cell id for offset o of cell c (works on traced scalars;
    offsets are in {-1,0,1} so adding nc keeps operands non-negative).
    All arithmetic pinned to int32 (the program id's dtype)."""
    nc1, nc2, nc3, _ = cells
    i32 = jnp.int32
    c = jnp.asarray(c, i32)
    n1, n2, n3 = i32(nc1), i32(nc2), i32(nc3)
    c1 = c // (n2 * n3)
    c2 = (c // n3) % n2
    c3 = c % n3
    a = jax.lax.rem(c1 + i32(o[0] + nc1), n1)
    b = jax.lax.rem(c2 + i32(o[1] + nc2), n2)
    d = jax.lax.rem(c3 + i32(o[2] + nc3), n3)
    return (a * n2 + b) * n3 + d


def _pair_math(own, sc, par_ref, tabs_ref, T, has_sapt, pair_once, valid_j):
    """Candidate-pair physics on one (ccap, J) block -- shared by the
    per-cell kernels and the column-walk kernel.

    own: (ccap, 8) row-major i-side [x y z q type mol 0 0]; sc: (8, J)
    component-major j-side; pair_once: (ccap, J) or broadcastable mask
    selecting each unordered pair once; valid_j: (1, J) j-lane validity.
    Returns (gxe, gye, gze, gxv, gyv, gzv, e_el_pair, e_vdw_pair), all
    (ccap, J), already zeroed outside the within-cutoff mask."""
    f32 = own.dtype
    Lx = par_ref[0, 0]
    Ly = par_ref[0, 1]
    Lz = par_ref[0, 2]
    rcut2 = par_ref[0, 3]
    alpha = par_ref[0, 4]
    conv = par_ref[0, 5]

    def mi(d, L):
        return d - L * jnp.round(d * (1.0 / L))

    dx = mi(own[:, 0:1] - sc[0:1, :], Lx)
    dy = mi(own[:, 1:2] - sc[1:2, :], Ly)
    dz = mi(own[:, 2:3] - sc[2:3, :], Lz)
    r2 = dx * dx + dy * dy + dz * dz

    mol_i = own[:, 5:6]
    mol_j = sc[5:6, :]
    # mol >= 0 checks are load-bearing for empty slots: the 1e6 sentinel
    # position FOLDS back into the box under the minimum image
    within = ((r2 < rcut2) & (mol_i != mol_j)
              & (mol_i >= 0.0) & (mol_j >= 0.0)
              & valid_j & pair_once)

    r2s = jnp.where(within, r2, 1.0)
    inv_r2 = 1.0 / r2s
    r = jnp.sqrt(r2s)
    inv_r = 1.0 / r

    # erfc Ewald energy + force factor (pairwise_real_space_ewald)
    qq = (own[:, 3:4] * sc[3:4, :]) * conv
    ar = alpha * r
    erfc_ar = _erfc_pos(ar)
    gauss = jnp.exp(-ar * ar)
    e_el_pair = qq * erfc_ar * inv_r
    two_a_pi = 2.0 * alpha / SQRT_PI
    s_el = qq * (erfc_ar * inv_r + two_a_pi * gauss) * inv_r2

    # vdW parameters via one-hot MXU contractions
    ti = own[:, 4:5]
    tj = sc[4:5, :]
    tt_i = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(f32)
    tt_j = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0).astype(f32)
    oh_i = (ti == tt_i).astype(f32)
    oh_j = (tj == tt_j).astype(f32)

    def pair_tab(k):
        m = jnp.dot(tabs_ref[k], oh_j, preferred_element_type=f32)
        return jnp.dot(oh_i, m, preferred_element_type=f32)

    vt = pair_tab(0)
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
        Cs = [c6, pair_tab(5), pair_tab(6), pair_tab(7)]
        x_tt = jnp.minimum(B * r, 40.0)
        ex = jnp.exp(-x_tt)
        e_s = A * ex
        s_s = A * B * ex * inv_r
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
                dfn = ex * term / fact
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
    # masked displacements too: 0 * NaN/sentinel poisons the row sums
    dx = jnp.where(within, dx, zero)
    dy = jnp.where(within, dy, zero)
    dz = jnp.where(within, dz, zero)

    return (s_el * dx, s_el * dy, s_el * dz,
            s_vdw * dx, s_vdw * dy, s_vdw * dz, e_el_pair, e_vdw_pair)


def _fi_rows(parts, half):
    """i-side force rows + energy partial lanes: (ccap, 8) from the
    (ccap, J) per-pair partials."""
    gxe, gye, gze, gxv, gyv, gzv, e_el_pair, e_vdw_pair = parts
    ef = 1.0 if half else 0.5
    return jnp.concatenate(
        [-jnp.sum(gxe, axis=1, keepdims=True),
         -jnp.sum(gye, axis=1, keepdims=True),
         -jnp.sum(gze, axis=1, keepdims=True),
         -jnp.sum(gxv, axis=1, keepdims=True),
         -jnp.sum(gyv, axis=1, keepdims=True),
         -jnp.sum(gzv, axis=1, keepdims=True),
         ef * jnp.sum(e_el_pair, axis=1, keepdims=True),
         ef * jnp.sum(e_vdw_pair, axis=1, keepdims=True)], axis=1)


def _cs_rows(parts):
    """j-side component-major partials (8, J): one column reduction per
    force component, assembled by iota row-select (Mosaic cannot
    concatenate (1, J) vectors at distinct sublane offsets)."""
    f32 = parts[0].dtype
    J = parts[0].shape[1]
    rowsel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    CS = jnp.zeros((8, J), f32)
    for m, comp in enumerate(parts[:6]):
        cs = jnp.sum(comp, axis=0, keepdims=True)
        CS = CS + jnp.where(rowsel == m, cs, 0.0)
    return CS


def _kernel(cmt_ref, tabs_ref, par_ref, *refs,
            cells, T, n_tab, has_sapt, half):
    """One program per cell.

    cmt_ref  : (n_cells, 8, ccap) packed component-major atom data (VMEM)
               [x y z q type mol 0 0] -- component-major so the stencil
               loads below are plain dynamic-row copies (an in-kernel
               transpose per stencil block dominated an earlier version)
    tabs_ref : (n_tab, T, T) parameter tables (VMEM)
    par_ref  : (1, 8) float params [Lx Ly Lz rcut2 alpha conv 0 0] (SMEM)
    refs     : f_ref [, 13 per-offset j-side outputs when half], scratch
    f_ref    : (ccap, 8) per-atom [gx_el gy gz gx_vdw gy gz e_el e_vdw]
               = dE/dx plus the cell's energy partial sums spread over the
               two spare lanes (TPU blocks need 8-divisible sublanes, so a
               separate (1, 2) energy output is not lowerable)
    scratch  : (8, J) component-major stencil data
    """
    nc1, nc2, nc3, ccap = cells
    offs = _offsets(half)
    nsten = len(offs)
    if half:
        f_ref, nb_refs, scratch = refs[0], refs[1:nsten], refs[-1]
    else:
        f_ref, scratch = refs[0], refs[-1]
    c = pl.program_id(0)
    J = scratch.shape[1]
    f32 = cmt_ref.dtype

    # ---- gather the stencil blocks (static lane offsets, dynamic
    # leading-dim rows, no transposes); stencil ids are index arithmetic
    nbs = [_nb_of(c, o, cells) for o in offs]
    for k, nb in enumerate(nbs):
        scratch[:, k * ccap:(k + 1) * ccap] = cmt_ref[nb]  # (8, ccap)

    own = cmt_ref[c].T                                     # (ccap, 8)

    # self-pair / half ordering: compare packed slot (row) ids
    gid_i = (c * ccap
             + jax.lax.broadcasted_iota(jnp.int32, (ccap, 1), 0))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, J), 1)
    nb_of_lane = lane // ccap                              # 0.. (pad->max)
    gid_j = jnp.zeros((1, J), jnp.int32)
    for k, nb in enumerate(nbs):
        gid_j = jnp.where(nb_of_lane == k,
                          nb * ccap + lane - k * ccap, gid_j)
    # scratch lanes beyond nsten*ccap are uninitialized: exclude them (the
    # _pair_math mask also zeroes displacements, or 0 * NaN poisons sums)
    valid_j = lane < nsten * ccap
    if half:
        # block 0 is the self cell: strict upper triangle; cross-cell
        # blocks appear in exactly one program already
        pair_once = (nb_of_lane != 0) | (gid_i < gid_j)
    else:
        pair_once = gid_i != gid_j

    parts = _pair_math(own, scratch[...], par_ref, tabs_ref, T, has_sapt,
                       pair_once, valid_j)
    fi = _fi_rows(parts, half)

    if not half:
        f_ref[...] = fi
        return

    # ---- half path: j-side partials per stencil block, written
    # COMPONENT-MAJOR -- XLA transposes the summed result once, instead
    # of 13 in-kernel (8, ccap) transposes per program.
    CS = _cs_rows(parts)
    f_ref[...] = fi + CS[:, 0:ccap].T           # self block's j side
    for k in range(1, nsten):
        nb_refs[k - 1][0] = CS[:, k * ccap:(k + 1) * ccap]


def _col_of(p, o, cells):
    """xy-column id for offset o = (di, dj) of column p (traced scalars;
    offsets in {-1,0,1} so adding nc keeps operands non-negative)."""
    nc1, nc2, _, _ = cells
    i32 = jnp.int32
    p = jnp.asarray(p, i32)
    n1, n2 = i32(nc1), i32(nc2)
    a = jax.lax.rem(p // n2 + i32(o[0] + nc1), n1)
    b = jax.lax.rem(p % n2 + i32(o[1] + nc2), n2)
    return a * n2 + b


_COL_OFFS = ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))


def _kernel_column(cmt_ref, tabs_ref, par_ref, *refs,
                   cells, T, n_tab, has_sapt):
    """One program per xy-COLUMN of cells (z ghost-padded).

    cmt_ref  : (nc1*nc2, 8, Z*ccap) packed component-major column data,
               Z = nc3 + 2 with ghost copies of cells nc3-1 / 0 at the
               z-ends, so every z-run of stencil cells is a CONTIGUOUS
               lane range -- 5 column loads replace 14 per-cell stencil
               DMAs x nc3 cells, and 4 per-column j-side outputs replace
               13 per-cell ones.  The z loop is statically unrolled
               (static lane offsets; Mosaic forbids dynamic lane slices).
    refs     : f_ref (Z*ccap, 8) i-side rows + energy lanes,
               4 j-side outputs (1, 8, Z*ccap) at _col_of-mapped rows,
               5 column scratch (8, Z*ccap), 4 accumulators (8, Z*ccap),
               1 fbuf (Z*ccap, 8)
    Pair enumeration is the same half set as `_kernel`: self cell
    (upper triangle) + 13 positive offsets, grouped as self-column
    z∈{0,+1} and 4 positive columns z∈{-1,0,+1}."""
    nc1, nc2, nc3, ccap = cells
    Z = nc3 + 2
    Zc = Z * ccap
    f_ref = refs[0]
    nb_refs = refs[1:5]
    colbuf = refs[5:10]
    accbuf = refs[10:14]
    fbuf = refs[14]
    f32 = cmt_ref.dtype
    p = pl.program_id(0)

    for k, o in enumerate(_COL_OFFS):
        colbuf[k][...] = cmt_ref[_col_of(p, o, cells)]     # (8, Zc)
    for k in range(4):
        accbuf[k][...] = jnp.zeros((8, Zc), f32)
    fbuf[...] = jnp.zeros((Zc, 8), f32)

    J = 14 * ccap
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, J), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (ccap, 1), 0)
    # block 0 (self cell): strict upper triangle; all other blocks once
    pair_once = (lane >= ccap) | (row < lane)
    valid_j = lane < J

    for z in range(nc3):
        own = colbuf[0][:, (z + 1) * ccap:(z + 2) * ccap].T  # (ccap, 8)
        sc = jnp.concatenate(
            [colbuf[0][:, (z + 1) * ccap:(z + 3) * ccap]]   # self z, z+1
            + [colbuf[k][:, z * ccap:(z + 3) * ccap]        # z-1, z, z+1
               for k in range(1, 5)], axis=1)               # (8, 14*ccap)

        parts = _pair_math(own, sc, par_ref, tabs_ref, T, has_sapt,
                           pair_once, valid_j)
        a0 = (z + 1) * ccap
        # i-side rows ADD into fbuf (iteration z-1's self-column j
        # partials already landed on these rows -- overwrite would
        # destroy them)
        fbuf[a0:a0 + ccap, :] = (fbuf[a0:a0 + ccap, :]
                                 + _fi_rows(parts, True))
        CS = _cs_rows(parts)                                # (8, J)
        # self-column j side (blocks z, z+1): one (8, 2*ccap) transpose
        # per z into the row-major fbuf
        fbuf[a0:a0 + 2 * ccap, :] = (fbuf[a0:a0 + 2 * ccap, :]
                                     + CS[:, 0:2 * ccap].T)
        # positive columns' j side: component-major accumulation at the
        # ghost-extended lane range z .. z+3
        for k in range(1, 5):
            seg = CS[:, (2 + 3 * (k - 1)) * ccap:(2 + 3 * k) * ccap]
            accbuf[k - 1][:, z * ccap:(z + 3) * ccap] = (
                accbuf[k - 1][:, z * ccap:(z + 3) * ccap] + seg)

    f_ref[...] = fbuf[...]
    for k in range(4):
        nb_refs[k][0] = accbuf[k][...]


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
    impl = _impl_for(cells)
    half = impl == "half"
    nsten = len(_offsets(half))

    slot, overflow = _bin_atoms(x, box, cells)

    C8 = n_cells * ccap
    base = jnp.full((C8 + 1, 8), 0.0, f).at[:, 0:3].set(_SENTINEL)
    base = base.at[:, 5].set(-1.0)
    vals = jnp.concatenate(
        [x, charge[:, None].astype(f), atype[:, None].astype(f),
         mol[:, None].astype(f), jnp.zeros((N, 2), f)], axis=1)
    cm = base.at[slot].set(vals)[:C8]
    # component-major layout for the kernel's stencil loads (ONE XLA
    # relayout here instead of an in-kernel transpose per stencil block)
    cmt = cm.reshape(n_cells, ccap, 8).transpose(0, 2, 1)

    tabs = tabs.astype(f)
    L = jnp.diagonal(box).astype(f)
    par = jnp.array([[0.0] * 8], f).at[0, 0:3].set(L)
    par = par.at[0, 3].set(rcut * rcut).at[0, 4].set(alpha)
    par = par.at[0, 5].set(CONV_E2A_KJMOL)

    if impl == "column":
        f_cells = _forward_column(cm, tabs, par, cells, T, n_tab, has_sapt)
        e_el = jnp.sum(f_cells[:, 6])
        e_vdw = jnp.sum(f_cells[:, 7])
        fpad = jnp.concatenate([f_cells, jnp.zeros((1, 8), f)], axis=0)
        g = fpad[slot]
        return e_el, e_vdw, (g[:, 0:3], g[:, 3:6]), overflow

    J = nsten * ccap
    Jpad = -(-J // 128) * 128

    out_shape = [jax.ShapeDtypeStruct((C8, 8), f)]
    out_specs = [pl.BlockSpec((ccap, 8), lambda c: (c, 0),
                              memory_space=pltpu.VMEM)]
    if half:
        for o in _offsets(True)[1:]:
            out_shape.append(jax.ShapeDtypeStruct((n_cells, 8, ccap), f))
            out_specs.append(pl.BlockSpec(
                (1, 8, ccap),
                functools.partial(
                    lambda c, _o: (_nb_of(c, _o, cells), 0, 0), _o=o),
                memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        functools.partial(_kernel, cells=cells, T=T, n_tab=n_tab,
                          has_sapt=has_sapt, half=half),
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # cmt
            pl.BlockSpec(memory_space=pltpu.VMEM),          # tabs
            pl.BlockSpec((1, 8), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),          # par
        ],
        out_specs=out_specs if half else out_specs[0],
        out_shape=out_shape if half else out_shape[0],
        scratch_shapes=[pltpu.VMEM((8, Jpad), f)],
        interpret=not _on_tpu(),
    )(cmt, tabs, par)

    if half:
        nb_sum = res[1]
        for r in res[2:]:
            nb_sum = nb_sum + r                 # (n_cells, 8, ccap)
        f_cells = res[0] + nb_sum.transpose(0, 2, 1).reshape(C8, 8)
    else:
        f_cells = res

    e_el = jnp.sum(f_cells[:, 6])
    e_vdw = jnp.sum(f_cells[:, 7])
    fpad = jnp.concatenate([f_cells, jnp.zeros((1, 8), f)], axis=0)
    g = fpad[slot]                                         # (N, 8)
    return e_el, e_vdw, (g[:, 0:3], g[:, 3:6]), overflow


def _forward_column(cm, tabs, par, cells, T, n_tab, has_sapt):
    """Column-walk dispatch: ghost-pad the packed cells along z, run one
    program per xy-column, fold the ghost contributions back.  Returns
    f_cells (n_cells*ccap, 8) in the same layout as the per-cell paths."""
    nc1, nc2, nc3, ccap = cells
    f = cm.dtype
    P = nc1 * nc2
    Z = nc3 + 2
    Zc = Z * ccap

    cm3 = cm.reshape(nc1, nc2, nc3, ccap, 8)
    ghost = jnp.concatenate([cm3[:, :, -1:], cm3, cm3[:, :, :1]], axis=2)
    cmtz = ghost.reshape(P, Zc, 8).transpose(0, 2, 1)      # (P, 8, Zc)

    out_shape = [jax.ShapeDtypeStruct((P * Zc, 8), f)]
    out_specs = [pl.BlockSpec((Zc, 8), lambda p: (p, 0),
                              memory_space=pltpu.VMEM)]
    for o in _COL_OFFS[1:]:
        out_shape.append(jax.ShapeDtypeStruct((P, 8, Zc), f))
        out_specs.append(pl.BlockSpec(
            (1, 8, Zc),
            functools.partial(
                lambda p, _o: (_col_of(p, _o, cells), 0, 0), _o=o),
            memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        functools.partial(_kernel_column, cells=cells, T=T, n_tab=n_tab,
                          has_sapt=has_sapt),
        grid=(P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # cmtz
            pl.BlockSpec(memory_space=pltpu.VMEM),          # tabs
            pl.BlockSpec((1, 8), lambda p: (0, 0),
                         memory_space=pltpu.SMEM),          # par
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, Zc), f)] * 5         # column loads
        + [pltpu.VMEM((8, Zc), f)] * 4                      # j-side accs
        + [pltpu.VMEM((Zc, 8), f)],                         # fbuf
        interpret=not _on_tpu(),
    )(cmtz, tabs, par)

    def fold(r):
        """(P, Z, ccap, 8) ghost-extended -> (P, nc3, ccap, 8): ghost 0
        copies cell nc3-1, ghost Z-1 copies cell 0."""
        main = r[:, 1:nc3 + 1]
        main = main.at[:, nc3 - 1].add(r[:, 0])
        main = main.at[:, 0].add(r[:, nc3 + 1])
        return main

    acc = fold(res[0].reshape(P, Z, ccap, 8))
    for rk in res[1:]:
        acc = acc + fold(rk.transpose(0, 2, 1).reshape(P, Z, ccap, 8))
    return acc.reshape(nc1 * nc2 * nc3 * ccap, 8)


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
