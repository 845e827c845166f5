"""Fixed-capacity Verlet neighbor list.

TPU-native replacement for the reference's cell-list Verlet machinery
(general_routines.f90:1092-1669).  Differences by design:

  * the list is a padded (N, K) tensor of half neighbors (j > i), built by a
    chunked dense distance sweep under jit (static shapes, no host logic);
  * intra-molecular pairs ARE included and masked at use time with the
    per-diabat molecule assignment -- this is what makes the same list
    reusable across all MS-EVB diabats (the reference instead rebuilds
    topology-dependent screen lists per diabat, ms_evb.f90:1566-1894);
  * capacity overflow is reported as a flag; the host rebuilds with a larger
    capacity (mirrors the density-based sizing + safety factor of
    general_routines.f90:1231-1239).

The displacement-triggered rebuild check mirrors
update_verlet_displacements (general_routines.f90:1259-1337): rebuild when
the two largest displacements since the last build sum past the skin.
"""

import functools

import jax
import jax.numpy as jnp
from flax import struct

from ..utils import pbc


@struct.dataclass
class CellTable:
    """Persisted cell table for ON-DEMAND adjacency-row extraction.

    The MS-EVB consumers of the (N, K) adjacency read only a few dozen
    DYNAMIC rows per step (the changed-molecule superset, the hop donors)
    -- materializing and top_k-compacting all N rows at every rebuild was
    the dominant rebuild cost at 10^4 atoms.  Instead the build persists
    its packed component-major cell table ([fx|fy|fz|id] x ccap lanes,
    fractional coordinates at build time) and `rows_on_demand` extracts
    compacted rows for just the queried atoms inside the step.

    Coverage argument (same as the Verlet list itself): a pair within the
    use-time cutoff now was within `cutoff` (use cutoff + skin) at build
    time, so filtering STALE table positions against current query cells
    at `cutoff` keeps every true pair as long as the displacement trigger
    (needs_rebuild) fires before drift exceeds the skin."""
    tab: jnp.ndarray          # (n_cells, 4*ccap) f32 [fx|fy|fz|id]
    cutoff: jnp.ndarray = None  # () coverage distance (build cutoff; a LEAF:
    #                             the build traces it, so it must not land in
    #                             aux data)
    cells: tuple = struct.field(pytree_node=False, default=())
    row_cap: int = struct.field(pytree_node=False, default=0)
    n_atoms: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class NeighborList:
    idx: jnp.ndarray          # (N, K) int32, -1 padded, j > i half list
    full_idx: jnp.ndarray     # (N, 2K) int32, -1 padded, all neighbors
    ref_x: jnp.ndarray        # (N, 3) positions at build time
    overflow: jnp.ndarray     # () bool
    capacity: int = struct.field(pytree_node=False, default=0)
    # cell-list config (static): () = dense build, else (nc1, nc2, nc3, cap)
    cells: tuple = struct.field(pytree_node=False, default=())
    # short-cutoff full adjacency for the EVB proton-hop candidate search
    # (evb_reactive_pair_distance + skin); None unless requested -- shrinks
    # the per-level (S, A, Kf) enumeration gathers ~4x vs full_idx rows
    react_idx: jnp.ndarray = None     # (N, Kr) int32 or None
    react_cutoff: float = struct.field(pytree_node=False, default=0.0)
    react_cap: int = struct.field(pytree_node=False, default=0)
    # on-demand row sources (cell path): replace the materialized
    # full_idx/react_idx entirely when present (full_idx comes back (N, 0))
    celltab: CellTable = None         # verlet-cutoff coverage
    react_tab: CellTable = None       # react-cutoff coverage (finer grid)
    react_cells: tuple = struct.field(pytree_node=False, default=())


def suggest_capacity(n_atoms, volume, cutoff, safety=1.2):
    """Density-based half-list sizing (cf. general_routines.f90:1231-1239)."""
    import math
    # per-row capacity must cover the FULL neighbor count: in a (N, K)
    # padded half list, low-index atoms keep nearly all their neighbors
    per_atom = 4.0 / 3.0 * math.pi * cutoff ** 3 * n_atoms / volume
    cap = int(math.ceil(per_atom * safety)) + 8
    return max(16, min(cap, n_atoms - 1))


def suggest_cells(n_atoms, box, cutoff, safety=1.45, min_atoms=1024):
    """Host-side cell-grid sizing for the O(N) build path.

    TPU analog of the reference's grid cell list
    (construct_verlet_list_grid, general_routines.f90:1408-1595): the grid
    dimensions are fixed for the run (the reference requires 10-99 cells per
    axis, :1450-1452); here they are compile-time constants of the build
    kernel.  Returns () when the dense sweep is the better kernel (small
    systems, or fewer than 3 cells per axis -- a 27-stencil over <3 cells
    would visit the same cell twice).

    `safety` oversizes the per-cell capacity: NPT moves atoms between cells
    and density fluctuates; overflow is flagged and the host regrows.
    """
    import math
    import numpy as np
    if n_atoms < min_atoms:
        return ()
    b = np.asarray(box, dtype=np.float64)
    vol = abs(float(np.linalg.det(b)))
    # plane-spacing widths: w_i = 1/|recip_i| (general triclinic form)
    recip = np.linalg.inv(b).T
    widths = 1.0 / np.linalg.norm(recip, axis=1)
    nc = [int(w // cutoff) for w in widths]
    if min(nc) < 3:
        return ()
    per_cell = n_atoms / (nc[0] * nc[1] * nc[2])
    # Poisson occupancy tail: lambda + 4 sqrt(lambda) covers ~1e-5 per cell;
    # the multiplicative safety dominates at high density (NPT compression)
    cap = max(4, int(math.ceil(per_cell * safety)),
              int(math.ceil(per_cell + 4.0 * math.sqrt(per_cell))) + 4)
    return (nc[0], nc[1], nc[2], cap)


def _full_cap_of(capacity, N):
    """Width of the full adjacency.  `capacity` is already sized for the
    FULL per-atom neighbor count (suggest_capacity: a padded j>i half list
    keeps nearly all neighbors on low-index rows), so the full rows need
    only a small safety margin on top -- the old 2x was pure top_k and
    downstream-gather waste.  The shared overflow flag + host regrow
    remain the safety net."""
    return min(capacity + 8, N - 1)


@functools.partial(jax.jit, static_argnames=("capacity", "chunk",
                                              "react_cutoff", "react_cap",
                                              "build_half"))
def build_neighbor_list(x, box, cutoff, capacity, chunk=512,
                        react_cutoff=0.0, react_cap=0, build_half=True):
    """Neighbor lists of all atom pairs within cutoff.

    Builds the views in one sweep: the half list (j > i, used by the main
    pair sum), the full adjacency (used by the EVB delta diagonals to
    enumerate every pair touching a changed atom) and, when react_cap > 0,
    the short-cutoff full adjacency for the proton-hop candidate search.

    build_half=False skips the half list entirely (idx comes back (N, 0)):
    on the fused-Pallas-kernel path the pair sweep bins atoms itself and
    the half list has no consumer -- its compaction was pure build cost."""
    N = x.shape[0]
    capacity = min(capacity, N - 1)
    full_cap = _full_cap_of(capacity, N)
    react_cap = min(react_cap, N - 1)
    n_chunks = -(-N // chunk)
    pad_n = n_chunks * chunk
    xp = jnp.pad(x, ((0, pad_n - N), (0, 0)))
    cutoff2 = cutoff * cutoff

    def one_chunk(c):
        i0 = c * chunk
        xi = jax.lax.dynamic_slice_in_dim(xp, i0, chunk, axis=0)
        dr = xi[:, None, :] - x[None, :, :]
        dr = pbc.min_image(dr, box)
        d2 = jnp.sum(dr * dr, axis=-1)
        i_idx = i0 + jnp.arange(chunk)[:, None]
        j_idx = jnp.arange(N)[None, :]
        fmask = (d2 < cutoff2) & (j_idx != i_idx) & (i_idx < N)
        hmask = fmask & (j_idx > i_idx)

        out = (first_true_columns(hmask, capacity) if build_half
               else jnp.zeros((chunk, 0), jnp.int32),
               first_true_columns(fmask, full_cap),
               jnp.sum(hmask, axis=1) if build_half
               else jnp.zeros((chunk,), jnp.int32),
               jnp.sum(fmask, axis=1))
        if react_cap > 0:
            rmask = fmask & (d2 < react_cutoff * react_cutoff)
            out += (first_true_columns(rmask, react_cap),
                    jnp.sum(rmask, axis=1))
        return out

    res = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    hvals, fvals, hcounts, fcounts = res[:4]
    idx = hvals.reshape(pad_n, capacity if build_half else 0)[:N]
    full_idx = fvals.reshape(pad_n, full_cap)[:N]
    overflow = jnp.any(fcounts.reshape(-1)[:N] > full_cap)
    if build_half:
        overflow = overflow | jnp.any(hcounts.reshape(-1)[:N] > capacity)
    react_idx = None
    if react_cap > 0:
        react_idx = res[4].reshape(pad_n, react_cap)[:N]
        overflow = overflow | jnp.any(res[5].reshape(-1)[:N] > react_cap)
    return NeighborList(idx=idx, full_idx=full_idx, ref_x=x,
                        overflow=overflow, capacity=capacity,
                        react_idx=react_idx, react_cutoff=react_cutoff,
                        react_cap=react_cap)


def first_true_columns(mask, cap, idx_val=None):
    """Compact each row's masked values into (..., cap), ASCENDING, -1
    padded.  idx_val defaults to the column index, in which case this is
    "the first cap True columns".

    The value is embedded in the top_k key (key = bound - value), so the
    selection needs NO take_along_axis -- on TPU that per-element gather
    serializes (~3.8 ms/step of the 10k profile came from it).  Ascending
    order falls out for free, which is exactly what the reactive
    adjacency and the diabat-candidate search need for a deterministic
    dense==cell discovery order; the pair-list consumers treat rows as
    sets.  The single implementation of this subtle kernel."""
    n = mask.shape[-1]
    k = min(cap, n)
    if idx_val is None:
        v = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), mask.shape)
        bound = n
    else:
        v = idx_val.astype(jnp.int32)
        bound = jnp.int32(2 ** 30)        # > any atom index
    key = jnp.where(mask, bound - v, 0)
    kvals = jax.lax.top_k(key, k)[0]
    out = jnp.where(kvals > 0, bound - kvals, -1).astype(jnp.int32)
    if k < cap:
        pad = [(0, 0)] * (out.ndim - 1) + [(0, cap - k)]
        out = jnp.pad(out, pad, constant_values=-1)
    return out


def _frac_cells(x, box, cells, cutoff):
    """Fractional coords, cell index per atom, and the box-validity flag
    (every cell's plane spacing must still span >= cutoff)."""
    nc1, nc2, nc3, _ = cells
    ncv = jnp.array([nc1, nc2, nc3], jnp.int32)
    recip = pbc.recip_vectors(box)
    widths = 1.0 / jnp.sqrt(jnp.sum(recip * recip, axis=1))
    box_bad = jnp.any(widths / ncv.astype(x.dtype) < cutoff)
    frac = pbc.xyz_to_frac(x, box)
    frac = frac - jnp.floor(frac)
    ci = jnp.clip((frac * ncv).astype(jnp.int32), 0, ncv - 1)   # (N, 3)
    return frac, ci, box_bad


def _pack_cell_table(frac, ci, cells):
    """Component-major packed cell table + cell-capacity overflow.

    Each cell's row is [fx(ccap) | fy(ccap) | fz(ccap) | id(ccap)] so
    candidate extraction is ONE row gather of 4*ccap-lane rows per stencil
    cell and components come out as static lane-dim slices (see the layout
    notes in build_neighbor_list_cell)."""
    nc1, nc2, nc3, ccap = cells
    n_cells = nc1 * nc2 * nc3
    N = frac.shape[0]
    f = frac.dtype
    cell_id = (ci[:, 0] * nc2 + ci[:, 1]) * nc3 + ci[:, 2]      # (N,)
    order = jnp.argsort(cell_id).astype(jnp.int32)
    sorted_id = cell_id[order]
    ar = jnp.arange(N, dtype=jnp.int32)
    first = jnp.concatenate([jnp.array([True]),
                             sorted_id[1:] != sorted_id[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, ar, 0))
    rank = ar - run_start
    cell_over = jnp.any(rank >= ccap)
    slot = jnp.where(rank < ccap, sorted_id * ccap + rank, n_cells * ccap)

    def cell_tab(v, fill):
        t = jnp.full((n_cells * ccap + 1,), jnp.asarray(fill, f), f)
        return t.at[slot].set(v.astype(f))[:-1].reshape(n_cells, ccap)

    fo = frac[order]
    tab = jnp.concatenate([cell_tab(fo[:, 0], 0), cell_tab(fo[:, 1], 0),
                           cell_tab(fo[:, 2], 0), cell_tab(order, N)],
                          axis=1)                               # (n_cells, 4c)
    return tab, cell_over


def build_cell_table(x, box, cells, row_cap, cutoff):
    """(CellTable, overflow): bin atoms into `cells` for later on-demand
    row extraction at `cutoff` coverage (build cutoff + skin)."""
    frac, ci, box_bad = _frac_cells(x, box, cells, cutoff)
    tab, cell_over = _pack_cell_table(frac, ci, cells)
    ct = CellTable(tab=tab, cutoff=jnp.asarray(cutoff, x.dtype),
                   cells=cells, row_cap=row_cap, n_atoms=x.shape[0])
    return ct, cell_over | box_bad


_STENCIL_O3 = None


def _stencil_offsets():
    global _STENCIL_O3
    if _STENCIL_O3 is None:
        import numpy as np
        off = np.arange(-1, 2)
        _STENCIL_O3 = np.stack(np.meshgrid(off, off, off, indexing="ij"),
                               axis=-1).reshape(27, 3).astype(np.int32)
    return jnp.asarray(_STENCIL_O3)


def rows_on_demand(ct: CellTable, x, box, atoms):
    """Compacted adjacency rows for `atoms` from a persisted cell table.

    Returns ((n, row_cap) int32 rows, -1 padded, ascending global j;
    (n,) per-row overflow -- callers mask padded query rows before
    reducing).  The contract matches `full_idx[atoms]` as a row
    SOURCE: every pair within (ct.cutoff - skin) of a query atom at use
    time is present (stale-position filter at ct.cutoff -- the same
    coverage the materialized Verlet rows give between rebuilds); the
    consumer's own use-time distance mask makes energies exact.  Works
    under vmap (atoms may be a traced (n,) batch per state)."""
    nc1, nc2, nc3, ccap = ct.cells
    ncv = jnp.array([nc1, nc2, nc3], jnp.int32)
    N = ct.n_atoms
    xq = x[atoms]                                               # (n, 3)
    frac = pbc.xyz_to_frac(xq, box)
    frac = frac - jnp.floor(frac)
    ci = jnp.clip((frac * ncv).astype(jnp.int32), 0, ncv - 1)   # (n, 3)
    nbc = jnp.mod(ci[:, None, :] + _stencil_offsets()[None], ncv)
    nb_id = (nbc[..., 0] * nc2 + nbc[..., 1]) * nc3 + nbc[..., 2]
    blocks = ct.tab[nb_id]                                      # (n, 27, 4c)
    n = atoms.shape[0]

    def comp(k):
        return blocks[:, :, k * ccap:(k + 1) * ccap].reshape(n, 27 * ccap)

    cand = jnp.round(comp(3)).astype(jnp.int32)                 # (n, 27*ccap)
    # stale candidate positions vs CURRENT query position, per-component
    # fractional min-image (any box), cartesian distance via the row
    # transform -- identical form to the build's own filter
    df = [frac[:, k:k + 1] - comp(k) for k in range(3)]
    df = [d - jnp.floor(d + 0.5) for d in df]
    d2 = sum((df[0] * box[0, k] + df[1] * box[1, k]
              + df[2] * box[2, k]) ** 2 for k in range(3))
    mask = (cand < N) & (cand != atoms[:, None]) \
        & (d2 < ct.cutoff * ct.cutoff)
    rows = first_true_columns(mask, ct.row_cap, cand)
    overflow = jnp.sum(mask, axis=-1) > ct.row_cap             # (n,)
    return rows, overflow


@functools.partial(jax.jit, static_argnames=("capacity", "cells",
                                              "react_cutoff", "react_cap",
                                              "build_half", "on_demand",
                                              "react_cells"))
def build_neighbor_list_cell(x, box, cutoff, capacity, cells,
                             react_cutoff=0.0, react_cap=0,
                             build_half=True, on_demand=False,
                             react_cells=()):
    """O(N) cell-list neighbor build (static grid, fixed cell capacity).

    Replaces the dense O(N^2) sweep for large systems; TPU-shaped version of
    construct_verlet_list_grid (general_routines.f90:1408-1595):

      * atoms are bucketed into a static (nc1, nc2, nc3) fractional-space
        grid by one sort (vs the reference's per-cell linked strings);
      * each atom gathers candidates from its 27-cell stencil
        ((N, 27*cell_cap) static shape) and distance-filters them;
      * overflow (cell capacity, row capacity, or a box shrunk below one
        cutoff per cell under NPT) sets the flag; the host regrows exactly
        like the dense path's escape hatch.

    With on_demand=True the (N, K) full/react adjacencies are NOT
    materialized (their per-rebuild top_k over (N, 27*ccap) dominated the
    10^4-atom rebuild): the packed cell table itself is persisted as
    NeighborList.celltab (plus a finer react-cutoff table when
    `react_cells` is a valid grid) and the MS-EVB consumers extract just
    the rows they touch via `rows_on_demand`.

    Cell-table layout notes (also apply to rows_on_demand): COMPONENT-
    MAJOR [fx(ccap)|fy(ccap)|fz(ccap)|id(ccap)] rows make candidate
    extraction ONE row gather of 4*ccap-lane rows per stencil cell with
    components as static lane-dim slices.  Two earlier forms were
    measured slower at 10^4 atoms: an element-indexed id table +
    per-element position gathers (~12 ms/step -- TPU gathers serialize
    per row/element), and (ccap, 4)-interleaved blocks whose trailing dim
    of 4 forced stride-4 lane relayouts on every consumer (~4 ms/step of
    "data formatting").  Fractional coordinates make the minimum image
    per-component (fold by round) for ANY box, with the cartesian
    distance reconstructed by a fused 3x3 row transform.
    """
    N = x.shape[0]
    nc1, nc2, nc3, ccap = cells
    capacity = min(capacity, N - 1)
    full_cap = _full_cap_of(capacity, N)
    cutoff2 = cutoff * cutoff
    ncv = jnp.array([nc1, nc2, nc3], jnp.int32)
    react_cap = min(react_cap, N - 1)
    f = x.dtype

    frac, ci, box_bad = _frac_cells(x, box, cells, cutoff)
    tab, cell_over = _pack_cell_table(frac, ci, cells)

    celltab = react_tab = None
    if on_demand:
        celltab = CellTable(tab=tab, cutoff=jnp.asarray(cutoff, f),
                            cells=cells, row_cap=full_cap, n_atoms=N)
        od_over = cell_over | box_bad
        if react_cap > 0:
            if react_cells:
                react_tab, r_over = build_cell_table(
                    x, box, react_cells, react_cap, react_cutoff)
                od_over = od_over | r_over
            else:
                # no valid finer grid: extract react rows from the coarse
                # table (wider stencil, same coverage)
                react_tab = celltab.replace(
                    row_cap=react_cap, cutoff=jnp.asarray(react_cutoff, f))
        if not build_half:
            # nothing left to materialize: skip the (N, 27*ccap) candidate
            # sweep and its top_k compactions entirely
            return NeighborList(idx=jnp.zeros((N, 0), jnp.int32),
                                full_idx=jnp.zeros((N, 0), jnp.int32),
                                ref_x=x, overflow=od_over, capacity=capacity,
                                cells=cells, react_idx=None,
                                react_cutoff=react_cutoff,
                                react_cap=react_cap,
                                celltab=celltab, react_tab=react_tab,
                                react_cells=react_cells)

    # 27-stencil candidate cells per atom
    nbc = jnp.mod(ci[:, None, :] + _stencil_offsets()[None], ncv)
    nb_id = (nbc[..., 0] * nc2 + nbc[..., 1]) * nc3 + nbc[..., 2]
    blocks = tab[nb_id]                                         # (N, 27, 4c)

    def comp(k):
        return blocks[:, :, k * ccap:(k + 1) * ccap].reshape(N, 27 * ccap)

    cand = jnp.round(comp(3)).astype(jnp.int32)                 # (N, 27*ccap)
    df = [frac[:, k:k + 1] - comp(k) for k in range(3)]
    df = [d - jnp.floor(d + 0.5) for d in df]                   # min image
    d2 = sum((df[0] * box[0, k] + df[1] * box[1, k]
              + df[2] * box[2, k]) ** 2 for k in range(3))
    ar = jnp.arange(N, dtype=jnp.int32)
    i_idx = ar[:, None]
    fmask = (cand < N) & (cand != i_idx) & (d2 < cutoff2)

    if build_half:
        hmask = fmask & (cand > i_idx)
        idx = first_true_columns(hmask, capacity, cand)
        half_over = jnp.any(jnp.sum(hmask, axis=1) > capacity)
    else:
        idx = jnp.zeros((N, 0), jnp.int32)
        half_over = jnp.asarray(False)
    overflow = cell_over | box_bad | half_over
    react_idx = None
    if on_demand:
        # half list materialized above; full/react come from the tables
        full_idx = jnp.zeros((N, 0), jnp.int32)
        overflow = overflow | od_over
    else:
        full_idx = first_true_columns(fmask, full_cap, cand)
        overflow = overflow | jnp.any(jnp.sum(fmask, axis=1) > full_cap)
        if react_cap > 0:
            rmask = fmask & (d2 < react_cutoff * react_cutoff)
            react_idx = first_true_columns(rmask, react_cap, cand)
            overflow = overflow | jnp.any(jnp.sum(rmask, axis=1) > react_cap)
    return NeighborList(idx=idx, full_idx=full_idx, ref_x=x,
                        overflow=overflow, capacity=capacity, cells=cells,
                        react_idx=react_idx, react_cutoff=react_cutoff,
                        react_cap=react_cap, celltab=celltab,
                        react_tab=react_tab, react_cells=react_cells)


def build_neighbors(x, box, cutoff, capacity, cells=(), react_cutoff=0.0,
                    react_cap=0, build_half=True, on_demand=False,
                    react_cells=()):
    """Dispatch the dense or cell-list build on the static config."""
    if cells:
        return build_neighbor_list_cell(x, box, cutoff, capacity, cells,
                                        react_cutoff=react_cutoff,
                                        react_cap=react_cap,
                                        build_half=build_half,
                                        on_demand=on_demand,
                                        react_cells=react_cells)
    return build_neighbor_list(x, box, cutoff, capacity,
                               react_cutoff=react_cutoff,
                               react_cap=react_cap, build_half=build_half)


def rebuild_like(nlist: NeighborList, x, box, cutoff):
    """Rebuild with the same static configuration as an existing list."""
    return build_neighbors(x, box, cutoff, nlist.capacity, nlist.cells,
                           react_cutoff=nlist.react_cutoff,
                           react_cap=nlist.react_cap,
                           build_half=nlist.idx.shape[1] > 0,
                           on_demand=nlist.celltab is not None,
                           react_cells=nlist.react_cells)


def needs_rebuild(nlist: NeighborList, x, box, skin):
    """True when the two largest displacements since build exceed the skin
    (general_routines.f90:1320-1326).

    Exact top-2 via argmax + a masked second max: lax.top_k lowers to a
    sort on TPU (~0.2 ms/step at 10^4 atoms for two values)."""
    dr = pbc.min_image(x - nlist.ref_x, box)
    d2 = jnp.sum(dr * dr, axis=-1)
    i1 = jnp.argmax(d2)
    m1 = d2[i1]
    m2 = jnp.max(d2.at[i1].set(-1.0))
    return (jnp.sqrt(m1) + jnp.sqrt(jnp.maximum(m2, 0.0))) > skin


def neighbor_pairs(nlist: NeighborList):
    """Expose the (N,K) half list as broadcastable (i, j, mask) index arrays.

    i is (N, 1) and j/mask are (N, K): the pair kernels broadcast, so every
    i-side value gather is an O(N) row gather instead of an O(N*K) flat
    gather (and its force transpose is a cheap row reduction instead of a
    scatter-add -- on TPU the flat-gather form was ~25% of the MD step)."""
    N, K = nlist.idx.shape
    i = jnp.arange(N, dtype=jnp.int32)[:, None]
    j = nlist.idx
    mask = j >= 0
    return i, jnp.where(mask, j, 0).astype(jnp.int32), mask
