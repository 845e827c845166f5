"""Diabat-state enumeration: the recursive proton-hop search as a
fixed-shape, jittable breadth-first expansion.

Replaces evb_conduct_proton_transfer_recursive / find_evb_reactive_neighbors
(ms_evb.f90:498-764).  Semantics preserved:

  * the search runs entirely in the PRINCIPLE topology (positions and
    molecule assignments before any hop) -- secondary hops donate one of the
    acceptor's own original protons;
  * a (donor molecule, reactive proton) pair accepts up to
    evb_max_neighbors acceptor atoms: molecules within
    evb_first_solvation_cutoff COM-COM whose reactive basic atom is within
    evb_reactive_pair_distance of the proton;
  * chains stop at evb_max_chain hops, or when the acceptor is the
    principle hydronium (cycle detection, ms_evb.f90:572-598);
  * state 0 is the principle diabat; every other state records its parent,
    giving the coupling sparsity pattern (evb_diabat_coupling_matrix).

Deviation: states are discovered breadth-first rather than depth-first; the
set of diabats and the parent structure are identical, only the index order
differs.

Hop-log fields (per hop): [donor_mol, proton_atom, donor_heavy_atom,
acceptor_mol, acceptor_heavy_atom] with atom entries as GLOBAL atom indices
(stable across topologies -- positions never move between diabats).
"""

import jax
import jax.numpy as jnp
from flax import struct

from ..topology import System, Topology
from ..utils import pbc
from ..utils.constants import (EVB_FIRST_SOLVATION_CUTOFF,
                               EVB_REACTIVE_PAIR_DISTANCE)


@struct.dataclass
class DiabatSet:
    n_states: jnp.ndarray       # () int32
    hop_log: jnp.ndarray        # (S, C, 5) int32, -1 padded
    n_hops: jnp.ndarray         # (S,) int32
    parent: jnp.ndarray         # (S,) int32, -1 for state 0
    hydronium_of: jnp.ndarray   # (S,) int32: acid molecule of each diabat
    overflow: jnp.ndarray       # () bool


def molecule_com(x, topo: Topology, mass, box=None):
    """Per-molecule center of mass (M, 3).

    When `box` is given, atom positions are minimum-imaged against the
    molecule's first atom before averaging, so the COM is correct even for
    molecules split across the periodic boundary (a diabat's acceptor
    molecule can be split, since positions are shared across diabats --
    the reference instead physically re-wraps copies, make_molecule_whole,
    ms_evb.f90:876)."""
    from ..utils import pbc
    am = topo.mol_atoms                                   # (M, A)
    mask = am >= 0
    idx = jnp.maximum(am, 0)
    w = jnp.where(mask, mass[idx], 0.0)                   # (M, A)
    xs = x[idx]                                           # (M, A, 3)
    if box is not None:
        anchor = xs[:, :1, :]
        xs = anchor + pbc.min_image(xs - anchor, box)
    return jnp.sum(w[..., None] * xs, axis=1) / jnp.sum(w, axis=1)[:, None]


def enumerate_diabats(x, box, topo: Topology, system: System) -> DiabatSet:
    """Fixed-shape BFS over proton-hop chains."""
    x = jax.lax.stop_gradient(x)
    S = system.evb_max_states
    C = system.evb_max_chain
    Anb = min(system.evb_max_neighbors, system.n_atoms)
    A = system.max_atoms_per_mol
    N = system.n_atoms
    mt = system.mt

    com = molecule_com(x, topo, system.mass, box)         # (M, 3)
    # per-atom reactive-base flag in principle topology
    base_atom = mt.reactive_bases[topo.mol_mtype[topo.atom_mol],
                                  topo.atom_slot] > 0     # (N,)

    principle_h = topo.hydronium_mol

    hop_log = jnp.full((S, C, 5), -1, dtype=jnp.int32)
    n_hops = jnp.zeros((S,), jnp.int32)
    parent = jnp.full((S,), -1, jnp.int32)
    donor_of = jnp.full((S,), -1, jnp.int32)
    donor_of = donor_of.at[0].set(principle_h)
    stop = jnp.zeros((S,), bool)

    def cond(carry):
        head, count, *_ = carry
        return (head < count) & (head < S)

    def body(carry):
        head, count, hop_log, n_hops, parent, donor_of, stop, overflow = carry
        d = donor_of[head]
        expandable = (~stop[head]) & (n_hops[head] < C)

        # ---- candidate acceptors for every reactive proton slot of d
        d_mtype = topo.mol_mtype[d]
        d_atoms = topo.mol_atoms[d]                        # (A,)
        proton_ok = (mt.reactive_protons[d_mtype] > 0) & (d_atoms >= 0)
        g_p = jnp.maximum(d_atoms, 0)                      # (A,)

        dr = pbc.min_image(x[g_p][:, None, :] - x[None, :, :], box)
        dist2 = jnp.sum(dr * dr, axis=-1)                  # (A, N)
        dcom = pbc.min_image(com[d][None, :] - com, box)
        com_ok = jnp.sum(dcom * dcom, -1) < EVB_FIRST_SOLVATION_CUTOFF ** 2
        cand = (proton_ok[:, None] & base_atom[None, :]
                & (topo.atom_mol[None, :] != d)
                & com_ok[topo.atom_mol][None, :]
                & (dist2 < EVB_REACTIVE_PAIR_DISTANCE ** 2)
                & expandable)

        # keep at most evb_max_neighbors acceptors per proton, ascending
        # atom order (matches the reference's molecule-order scan)
        order = jnp.argsort(~cand, axis=1, stable=True)[:, :Anb]   # (A, Anb)
        order = order.astype(jnp.int32)
        sel = jnp.take_along_axis(cand, order, axis=1)             # (A, Anb)
        j_atom = jnp.where(sel, order, -1).reshape(-1)             # (A*Anb,)
        p_slot = jnp.broadcast_to(jnp.arange(A, dtype=jnp.int32)[:, None],
                                  (A, Anb)).reshape(-1)
        valid = j_atom >= 0

        n_new = jnp.sum(valid).astype(jnp.int32)
        slot = count + jnp.cumsum(valid).astype(jnp.int32) - 1
        ok = valid & (slot < S)
        tgt = jnp.where(ok, slot, S)                       # S = dump row

        j_safe = jnp.maximum(j_atom, 0)
        a_mol = topo.atom_mol[j_safe]
        proton_g = g_p[p_slot]
        heavy_slot = mt.bonded_heavy_slot[d_mtype, p_slot]
        heavy_g = jnp.where(heavy_slot >= 0,
                            d_atoms[jnp.maximum(heavy_slot, 0)], -1)

        new_hop = jnp.stack([jnp.full_like(j_atom, d), proton_g, heavy_g,
                             a_mol, j_safe], axis=-1)      # (A*Anb, 5)

        # append: copy parent chain + write new hop at row n_hops[head]
        pad = lambda arr: jnp.concatenate(
            [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)], axis=0)
        chain = jnp.broadcast_to(hop_log[head], (A * Anb, C, 5))
        chain = chain.at[:, n_hops[head], :].set(new_hop)
        hop_log = pad(hop_log).at[tgt].set(chain)[:S]
        n_hops = pad(n_hops).at[tgt].set(n_hops[head] + 1)[:S]
        parent = pad(parent).at[tgt].set(head)[:S]
        donor_of = pad(donor_of).at[tgt].set(a_mol)[:S]
        # cycle: acceptor is the principle hydronium -> don't expand further
        stop = pad(stop).at[tgt].set(a_mol == principle_h)[:S]

        overflow = overflow | (count + n_new > S)
        count = jnp.minimum(count + n_new, S)
        return head + 1, count, hop_log, n_hops, parent, donor_of, stop, \
            overflow

    init = (jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32), hop_log,
            n_hops, parent, donor_of, stop, jnp.asarray(False))
    head, count, hop_log, n_hops, parent, donor_of, stop, overflow = \
        jax.lax.while_loop(cond, body, init)

    return DiabatSet(n_states=count, hop_log=hop_log, n_hops=n_hops,
                     parent=parent, hydronium_of=donor_of, overflow=overflow)
