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


@struct.dataclass
class DiabatSet:
    n_states: jnp.ndarray       # () int32
    hop_log: jnp.ndarray        # (S, C, 5) int32, -1 padded
    n_hops: jnp.ndarray         # (S,) int32
    parent: jnp.ndarray         # (S,) int32, -1 for state 0
    hydronium_of: jnp.ndarray   # (S,) int32: acid molecule of each diabat
    overflow: jnp.ndarray       # () bool
    # a rows_on_demand extraction exceeded its row capacity (cell path);
    # handled by the driver's NEIGHBOR regrow, not the state-cap regrow
    row_overflow: jnp.ndarray = None    # () bool or None


def molecule_com(x, topo: Topology, mass, box=None, mt_mass=None):
    """Per-molecule center of mass (M, 3).

    When `box` is given, atom positions are minimum-imaged against the
    molecule's first atom before averaging, so the COM is correct even for
    molecules split across the periodic boundary (a diabat's acceptor
    molecule can be split, since positions are shared across diabats --
    the reference instead physically re-wraps copies, make_molecule_whole,
    ms_evb.f90:876).

    mt_mass: optional (MT, A) template slot masses -- replaces the
    (M*A,)-element mass gather (~0.09 ms/step serialized at 10^4 atoms)
    with a one-hot matmul.  Bit-exact: slot masses equal atom masses by
    construction (both come from the template's per-slot masses, and the
    diabat topology reorder matches atoms to the conjugate template)."""
    from ..utils import pbc
    am = topo.mol_atoms                                   # (M, A)
    mask = am >= 0
    idx = jnp.maximum(am, 0)
    if mt_mass is not None:
        from ..ops.lookup import one_hot_f
        f = x.dtype
        w0 = jnp.matmul(one_hot_f(topo.mol_mtype, mt_mass.shape[0], f),
                        mt_mass.astype(f),
                        precision=jax.lax.Precision.HIGH)
        w = jnp.where(mask, w0, 0.0)                      # (M, A)
    else:
        w = jnp.where(mask, mass[idx], 0.0)               # (M, A)
    xs = x[idx]                                           # (M, A, 3)
    if box is not None:
        anchor = xs[:, :1, :]
        xs = anchor + pbc.min_image(xs - anchor, box)
    return jnp.sum(w[..., None] * xs, axis=1) / jnp.sum(w, axis=1)[:, None]


def enumerate_diabats(x, box, topo: Topology, system: System,
                      full_idx=None, com=None) -> DiabatSet:
    """Level-synchronous BFS over proton-hop chains.

    TPU-shaped: evb_max_chain (3) batched expansion rounds, each expanding
    EVERY state of the previous level at once (vmap), instead of a
    sequential per-state loop -- the per-level candidate search is one
    (S, A, N) distance computation.

    With `full_idx` (the (N, Kf) full neighbor adjacency), the candidate
    search is restricted to each proton's neighbor row -- valid because
    evb_reactive_pair_distance (2.5 A) < real_space_cutoff <= the list's
    coverage even at maximum skin drift; rows are in ascending-j order for
    the dense build, so the discovered state order is unchanged."""
    from ..ops import neighbors as nbr_mod
    x = jax.lax.stop_gradient(x)
    S = system.evb_max_states
    C = system.evb_max_chain
    Anb = min(system.evb_max_neighbors, system.n_atoms)
    on_demand = isinstance(full_idx, nbr_mod.CellTable)
    if on_demand:
        Anb = min(Anb, full_idx.row_cap)
    elif full_idx is not None:
        # a row narrower than Anb cannot hold Anb candidates anyway;
        # without the clamp top_k(k=Anb) is a trace-time error on dilute
        # systems whose adjacency rows are thinner than evb_max_neighbors
        Anb = min(Anb, full_idx.shape[1])
    A = system.max_atoms_per_mol
    mt = system.mt

    if com is None:
        com = molecule_com(x, topo, system.mass, box)     # (M, 3)
    com = jax.lax.stop_gradient(com)
    principle_h = topo.hydronium_mol
    sidx = jnp.arange(S, dtype=jnp.int32)
    f = x.dtype
    if mt.base_atype is not None:
        # base flag by ATOM TYPE as a one-hot matvec: the per-atom
        # (mtype, slot) double gather below was ~0.17 ms/step at 10^4
        # atoms (serialized N-element fetches from M-/MT-sized tables)
        from ..ops.lookup import one_hot_f
        base_atom = jnp.matmul(
            one_hot_f(topo.atom_type, mt.base_atype.shape[0], f),
            mt.base_atype.astype(f),
            precision=jax.lax.Precision.HIGH) > 0.5
    else:
        base_atom = mt.reactive_bases[topo.mol_mtype[topo.atom_mol],
                                      topo.atom_slot] > 0  # (N,)

    # one packed per-atom array -> ONE j-side row gather per level
    # (positions + molecule + base flag; TPU gathers cost per row)
    packed = jnp.concatenate(
        [x, topo.atom_mol.astype(f)[:, None],
         base_atom.astype(f)[:, None]], axis=1)           # (N, 5)

    hop_log = jnp.full((S, C, 5), -1, dtype=jnp.int32)
    # meta columns: [n_hops, parent, donor_of, stop]
    meta = jnp.full((S, 4), -1, jnp.int32)
    meta = meta.at[:, 0].set(0).at[:, 3].set(0)
    meta = meta.at[0, 2].set(principle_h)
    overflow = jnp.asarray(False)
    row_overflow = jnp.asarray(False)

    def expand_one(d, active):
        """Candidates (P, Anb) for donor molecule d (principle topology).

        The expansion runs over the P reactive-proton template slots only
        (mt.proton_slots), not all A slots -- for the water/hydronium
        system that is 3 of 4 rows, for CH3SO3H 1 of 9.  Slot order is
        ascending, so the discovered state order matches the all-slots
        sweep exactly (non-proton rows never produced candidates)."""
        # COM neighborhood of THIS donor only -- (M,) per expanded state
        # instead of a precomputed (M, M) matrix, which at 10^4 atoms was
        # ~1.4 ms/step of pure wasted bandwidth (only donor rows are read)
        dcom = pbc.min_image(com[d][None, :] - com, box)
        com_ok_d = jnp.sum(dcom * dcom, -1) \
            < system.evb_first_solvation_cutoff ** 2       # (M,)
        d_mtype = topo.mol_mtype[d]
        pslots = mt.proton_slots[d_mtype]                  # (P,)
        slot_ok = pslots >= 0
        psafe = jnp.maximum(pslots, 0)
        d_atoms = topo.mol_atoms[d][psafe]                 # (P,)
        proton_ok = slot_ok & (d_atoms >= 0)
        g_p = jnp.maximum(d_atoms, 0)
        row_over = jnp.asarray(False)
        if full_idx is None:
            pj = packed[None, :, :]                        # (1, N, 5)
            row_ok = True
            jg = jnp.broadcast_to(
                jnp.arange(x.shape[0], dtype=jnp.int32)[None, :],
                (g_p.shape[0], x.shape[0]))                # (A, N)
        else:
            if on_demand:
                rows, over_r = nbr_mod.rows_on_demand(
                    full_idx, x, box, g_p)                 # (A, Kr)
                row_over = jnp.any(over_r & proton_ok)
            else:
                rows = full_idx[g_p]                       # (A, Kf)
            row_ok = rows >= 0
            jg = jnp.maximum(rows, 0)
            pj = packed[jg]                                # one gather
        xj = pj[..., 0:3]
        jmol = jnp.round(pj[..., 3]).astype(jnp.int32)
        base_j = pj[..., 4] > 0.5
        dr = pbc.min_image(x[g_p][:, None, :] - xj, box)
        dist2 = jnp.sum(dr * dr, axis=-1)                  # (A, Kf)
        cand = (proton_ok[:, None] & row_ok & base_j
                & (jmol != d)
                & com_ok_d[jmol]
                & (dist2 < system.evb_reactive_pair_distance ** 2)
                & active)
        # first Anb candidate columns (ascending global j: dense columns
        # are ordered, react_idx rows are sorted by the neighbor build)
        from ..ops.neighbors import first_true_columns
        j_atom = first_true_columns(cand, Anb, jg)         # (P, Anb)
        # bonded heavy partner of each proton SLOT (template-slot indexed)
        heavy_slot = mt.bonded_heavy_slot[d_mtype][psafe]  # (P,)
        all_atoms = topo.mol_atoms[d]                      # (A,)
        heavy_g = jnp.where(heavy_slot >= 0,
                            all_atoms[jnp.maximum(heavy_slot, 0)], -1)
        return j_atom, g_p, heavy_g, row_over & active

    lvl_begin = jnp.asarray(0, jnp.int32)
    lvl_end = jnp.asarray(1, jnp.int32)

    P_stat = int(mt.proton_slots.shape[1])
    for level in range(C):
        # static per-level batch bounds: level 0 expands exactly one state
        # (the principle diabat); level 1 can only expand the <= P*Anb
        # 1-hop states (they occupy rows [1, 1 + P*Anb) by construction).
        # Deeper levels must sweep the full padded batch.
        if level == 0:
            SL = 1
        elif level == 1:
            SL = min(S, 1 + P_stat * Anb)
        else:
            SL = S
        sidx_l = sidx[:SL]
        at_level = (sidx_l >= lvl_begin) & (sidx_l < lvl_end) \
            & (meta[:SL, 3] == 0)
        d_all = jnp.maximum(meta[:SL, 2], 0)
        j_atom, g_p, heavy_g, r_over = jax.vmap(expand_one)(d_all, at_level)
        row_overflow = row_overflow | jnp.any(r_over)
        # flatten (SL, P, Anb) in state-major, proton-major order (matches
        # the reference's per-donor proton loop ordering)
        P = j_atom.shape[1]
        j_flat = j_atom.reshape(-1)
        valid = j_flat >= 0
        src_state = jnp.repeat(sidx_l, P * Anb)
        p_rep = jnp.broadcast_to(
            jnp.arange(P, dtype=jnp.int32)[None, :, None],
            (SL, P, Anb)).reshape(-1)

        slot = lvl_end + jnp.cumsum(valid).astype(jnp.int32) - 1
        ok = valid & (slot < S)
        tgt = jnp.where(ok, slot, S)                       # S = dump row

        j_safe = jnp.maximum(j_flat, 0)
        a_mol = topo.atom_mol[j_safe]
        d_flat = d_all[src_state]
        proton_g = g_p[src_state, p_rep]
        heavy_flat = heavy_g[src_state, p_rep]

        new_hop = jnp.stack([d_flat, proton_g, heavy_flat, a_mol, j_safe],
                            axis=-1)                       # (SL*A*Anb, 5)
        chain = hop_log[src_state]                         # (SL*A*Anb, C, 5)
        chain = chain.at[:, level, :].set(new_hop)

        new_meta = jnp.stack(
            [jnp.full_like(a_mol, level + 1), src_state, a_mol,
             (a_mol == principle_h).astype(jnp.int32)], axis=-1)

        pad = lambda arr: jnp.concatenate(
            [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)], axis=0)
        hop_log = pad(hop_log).at[tgt].set(chain)[:S]
        meta = pad(meta).at[tgt].set(new_meta)[:S]

        n_new = jnp.sum(valid).astype(jnp.int32)
        overflow = overflow | (lvl_end + n_new > S)
        lvl_begin = lvl_end
        lvl_end = jnp.minimum(lvl_end + n_new, S)

    return DiabatSet(n_states=lvl_end, hop_log=hop_log, n_hops=meta[:, 0],
                     parent=meta[:, 1], hydronium_of=meta[:, 2],
                     overflow=overflow, row_overflow=row_overflow)
