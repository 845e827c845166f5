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
class NeighborList:
    idx: jnp.ndarray          # (N, K) int32, -1 padded, j > i half list
    full_idx: jnp.ndarray     # (N, 2K) int32, -1 padded, all neighbors
    ref_x: jnp.ndarray        # (N, 3) positions at build time
    overflow: jnp.ndarray     # () bool
    capacity: int = struct.field(pytree_node=False, default=0)


def suggest_capacity(n_atoms, volume, cutoff, safety=1.2):
    """Density-based half-list sizing (cf. general_routines.f90:1231-1239)."""
    import math
    # per-row capacity must cover the FULL neighbor count: in a (N, K)
    # padded half list, low-index atoms keep nearly all their neighbors
    per_atom = 4.0 / 3.0 * math.pi * cutoff ** 3 * n_atoms / volume
    cap = int(math.ceil(per_atom * safety)) + 8
    return max(16, min(cap, n_atoms - 1))


@functools.partial(jax.jit, static_argnames=("capacity", "chunk"))
def build_neighbor_list(x, box, cutoff, capacity, chunk=512):
    """Neighbor lists of all atom pairs within cutoff.

    Builds both views in one sweep: the half list (j > i, used by the main
    pair sum) and the full adjacency (used by the EVB delta diagonals to
    enumerate every pair touching a changed atom)."""
    N = x.shape[0]
    capacity = min(capacity, N - 1)
    full_cap = min(2 * capacity, N - 1)
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

        def squeeze(mask, cap):
            order = jnp.argsort(jnp.where(mask, 0, 1), axis=1, stable=True)
            sel = order[:, :cap]
            sel_mask = jnp.take_along_axis(mask, sel, axis=1)
            return jnp.where(sel_mask, sel, -1).astype(jnp.int32)

        return (squeeze(hmask, capacity), squeeze(fmask, full_cap),
                jnp.sum(hmask, axis=1), jnp.sum(fmask, axis=1))

    hvals, fvals, hcounts, fcounts = jax.lax.map(
        one_chunk, jnp.arange(n_chunks))
    idx = hvals.reshape(pad_n, capacity)[:N]
    full_idx = fvals.reshape(pad_n, full_cap)[:N]
    overflow = (jnp.any(hcounts.reshape(-1)[:N] > capacity)
                | jnp.any(fcounts.reshape(-1)[:N] > full_cap))
    return NeighborList(idx=idx, full_idx=full_idx, ref_x=x,
                        overflow=overflow, capacity=capacity)


def needs_rebuild(nlist: NeighborList, x, box, skin):
    """True when the two largest displacements since build exceed the skin
    (general_routines.f90:1320-1326)."""
    dr = pbc.min_image(x - nlist.ref_x, box)
    d = jnp.sqrt(jnp.sum(dr * dr, axis=-1))
    top2 = jax.lax.top_k(d, 2)[0]
    return (top2[0] + top2[1]) > skin


def neighbor_pairs(nlist: NeighborList):
    """Flatten the (N,K) half list into (P, 2) index pairs + mask."""
    N, K = nlist.idx.shape
    i = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, K))
    j = nlist.idx
    mask = j >= 0
    return i.reshape(-1), jnp.where(mask, j, 0).reshape(-1).astype(jnp.int32), \
        mask.reshape(-1)
