"""Per-diabat topology construction: applying proton hops as index rewrites.

This replaces the reference's physical data movement
(shift_array_data_donor_acceptor_transfer ms_evb.f90:2677-2840, conjugate
retyping :883-932, template reordering reorder_molecule_data_structures
:941-1006) with pure rewrites of the Topology index/charge arrays.  Atom
positions and global indices never change; the recursive force back-mapping
(map_diabat_force_to_principle_recursive :2608-2656) becomes unnecessary --
forces from autodiff are already in global atom order.

All functions are fixed-shape and jittable; build_diabat_topologies vmaps
apply over the state axis.
"""

import jax
import jax.numpy as jnp
from flax import struct

from ..topology import System, Topology
from .enumerate import DiabatSet


def _scatter_update(arr, idx, new_vals, mask):
    """Masked scatter that is safe under duplicate masked indices: writes
    deltas with .add, so masked entries contribute exactly zero."""
    idx = jnp.maximum(idx, 0)
    delta = jnp.where(mask, new_vals - arr[idx], jnp.zeros_like(new_vals))
    return arr.at[idx].add(delta)


def _reorder_to_template(atoms, types, template):
    """Greedy stable match of a molecule's slot list to a type template
    (reorder_molecule_data_structures, ms_evb.f90:941-1006): for each
    template slot i whose current type mismatches, rotate in the first
    later slot with the right type.  Applied to BOTH the acceptor (which
    gains the proton at its last slot) and the donor (which loses a proton
    from an arbitrary slot -- the reference avoids the donor case by
    REQUIRING acidic protons last, ms_evb.f90:144-167; this engine
    supports any template slot order)."""
    A = atoms.shape[0]
    slots = jnp.arange(A, dtype=jnp.int32)

    def body(i, carry):
        atoms, types = carry
        need = (template[i] >= 0) & (types[i] != template[i])
        cand = (slots > i) & (types == template[i])
        j = jnp.argmax(cand).astype(jnp.int32)
        do = need & jnp.any(cand)
        src = jnp.where(slots == i, j,
                        jnp.where((slots > i) & (slots <= j), slots - 1,
                                  slots))
        atoms = jnp.where(do, atoms[src], atoms)
        types = jnp.where(do, types[src], types)
        return atoms, types

    # statically unrolled (A is a small compile-time template width): a
    # lax.fori_loop lowers to a per-molecule while loop whose iteration
    # sync + carry copies cost more than the tiny body (six such loops
    # showed up in the step profile); unrolled, the bodies fuse
    carry = (atoms, types)
    for i in range(A):
        carry = body(i, carry)
    return carry


def apply_hop(topo: Topology, hop, system: System) -> Topology:
    """Apply one proton transfer.

    hop: (5,) int32 [donor_mol, proton_atom, donor_heavy, acceptor_mol,
    acceptor_heavy] in the CURRENT topology of `topo` (the donor molecule is
    in its acid form)."""
    ff, mt, evb = system.ff, system.mt, system.evb
    A = system.max_atoms_per_mol
    slots = jnp.arange(A, dtype=jnp.int32)

    d, proton, _, a, heavy_a = hop[0], hop[1], hop[2], hop[3], hop[4]

    # ---------- donor loses the proton: compact its slot list
    s_p = topo.atom_slot[proton]
    d_atoms = topo.mol_atoms[d]
    shifted = jnp.roll(d_atoms, -1).at[A - 1].set(-1)
    d_atoms_new = jnp.where(slots < s_p, d_atoms, shifted)

    # donor retypes to its conjugate base (ms_evb.f90:908-915), then its
    # slots are matched to the base template (a no-op for protons-last
    # templates; required for arbitrary slot orders)
    d_base_type = mt.conjugate_mtype[topo.mol_mtype[d]]
    t_new_d = jnp.where(
        d_atoms_new >= 0,
        evb.conjugate_atype[topo.atom_type[jnp.maximum(d_atoms_new, 0)]], -1)
    d_atoms_new, t_new_d = _reorder_to_template(d_atoms_new, t_new_d,
                                                mt.atype[d_base_type])
    d_mask = d_atoms_new >= 0
    d_idx = jnp.maximum(d_atoms_new, 0)
    atom_type = _scatter_update(topo.atom_type, d_idx, t_new_d, d_mask)
    charge = _scatter_update(
        topo.charge, d_idx, ff.charge_by_type[jnp.maximum(t_new_d, 0)],
        d_mask)
    atom_slot = _scatter_update(topo.atom_slot, d_idx, slots, d_mask)

    mol_mtype = topo.mol_mtype.at[d].set(d_base_type)
    mol_natom = topo.mol_natom.at[d].add(-1)
    mol_atoms = topo.mol_atoms.at[d].set(d_atoms_new)

    # ---------- acceptor gains the proton (appended at its last slot)
    n_a = mol_natom[a]
    a_atoms = mol_atoms[a].at[n_a].set(proton)
    acid_t = mt.conjugate_mtype[mol_mtype[a]]
    a_mask = a_atoms >= 0
    a_idx = jnp.maximum(a_atoms, 0)

    t_old_a = atom_type[a_idx]
    t_new_a = evb.conjugate_atype[t_old_a]
    # transferred proton takes the acid's proton type
    # (change_proton_index_proton_transfer, ms_evb.f90:2992-3004)
    t_new_a = jnp.where(a_atoms == proton, mt.proton_atype[acid_t], t_new_a)
    # the protonated heavy atom takes the acid's heavy type (ms_evb.f90:903-905)
    t_new_a = jnp.where(a_atoms == heavy_a, mt.heavy_atype[acid_t], t_new_a)
    t_new_a = jnp.where(a_atoms >= 0, t_new_a, -1)   # padded slots inert

    # ---------- reorder acceptor slots to the acid template
    a_atoms, t_new_a = _reorder_to_template(a_atoms, t_new_a,
                                            mt.atype[acid_t])
    a_mask = a_atoms >= 0
    a_idx = jnp.maximum(a_atoms, 0)

    atom_type = _scatter_update(atom_type, a_idx, t_new_a, a_mask)
    charge = _scatter_update(charge, a_idx,
                             ff.charge_by_type[t_new_a], a_mask)
    atom_slot = _scatter_update(atom_slot, a_idx, slots, a_mask)

    mol_mtype = mol_mtype.at[a].set(acid_t)
    mol_natom = mol_natom.at[a].add(1)
    mol_atoms = mol_atoms.at[a].set(a_atoms)
    atom_mol = topo.atom_mol.at[proton].set(a)

    return Topology(mol_mtype=mol_mtype, mol_natom=mol_natom,
                    mol_atoms=mol_atoms, atom_mol=atom_mol,
                    atom_slot=atom_slot, atom_type=atom_type, charge=charge,
                    hydronium_mol=a.astype(jnp.int32))


def diabat_topology(topo: Topology, hop_log_s, n_hops_s,
                    system: System) -> Topology:
    """Apply one state's hop chain (fixed loop over evb_max_chain)."""
    C = hop_log_s.shape[0]

    def body(i, t):
        def do(t):
            return apply_hop(t, hop_log_s[i], system)
        return jax.lax.cond(i < n_hops_s, do, lambda t: t, t)

    return jax.lax.fori_loop(0, C, body, topo)


@struct.dataclass
class DiabatBatch:
    dset: DiabatSet
    topo: Topology              # batched over leading state axis
    changed_atoms: jnp.ndarray  # (S, 2*C*A) int32, -1 padded
    changed_mask: jnp.ndarray   # (S, 2*C*A) bool


def _changed_atoms_one(topo: Topology, hop_log_s):
    """Atoms of every molecule touched by a state's chain (for delta-Q PME);
    membership is taken in the PRINCIPLE topology -- the union of
    donor+acceptor atom sets is identical in both topologies."""
    mols = jnp.concatenate([hop_log_s[:, 0], hop_log_s[:, 3]])       # (2C,)
    mvalid = mols >= 0
    atoms = topo.mol_atoms[jnp.maximum(mols, 0)]                     # (2C, A)
    cmask = (mvalid[:, None] & (atoms >= 0)).reshape(-1)
    flat = atoms.reshape(-1)
    # dedupe: consecutive hops share molecules; a duplicated entry would
    # double-count its charge delta in the delta-Q scatter
    eq = flat[:, None] == flat[None, :]
    seen_before = jnp.any(jnp.tril(eq, -1) & cmask[None, :], axis=1)
    cmask = cmask & ~seen_before
    return jnp.where(cmask, flat, -1), cmask


def build_diabat_topologies_sequential(topo: Topology, dset: DiabatSet,
                                       system: System) -> DiabatBatch:
    """Ground-truth builder: apply_hop chains on the full-size arrays.
    Kept as the reference for build_diabat_topologies (tested equal)."""

    def build_one(hop_log_s, n_hops_s):
        t = diabat_topology(topo, hop_log_s, n_hops_s, system)
        changed, cmask = _changed_atoms_one(topo, hop_log_s)
        return t, changed, cmask

    topo_b, changed, cmask = jax.vmap(build_one)(dset.hop_log, dset.n_hops)
    return DiabatBatch(dset=dset, topo=topo_b, changed_atoms=changed,
                       changed_mask=cmask)


def build_diabat_topologies(topo: Topology, dset: DiabatSet,
                            system: System) -> DiabatBatch:
    """Compact-domain builder (the default, == sequential path, tested).

    A state's chain touches at most C+1 molecules, so the sequential hop
    application runs on (C+1, A) chain-molecule blocks -- tiny tensors --
    and the full-size (N,)/(M,A) topology arrays are written ONCE per state
    at the end, instead of ~6 full-size scatters per hop.  This removes the
    serialized small-scatter chain that dominated the enumeration/build
    phase of the profiled TPU step.

    Chains that revisit a molecule (e.g. the back-transfer A->B->A ending at
    the principle hydronium) are handled by canonicalizing each chain
    position to its FIRST row, so every molecule has one authoritative
    block."""
    ff, mt, evb = system.ff, system.mt, system.evb
    A = system.max_atoms_per_mol
    C = dset.hop_log.shape[1]
    R = C + 1
    slots = jnp.arange(A, dtype=jnp.int32)
    rows = jnp.arange(R, dtype=jnp.int32)

    def build_one(hop_log_s, n_hops_s, hydronium_s):
        # chain molecules: donor of hop 0, then each hop's acceptor
        cm = jnp.concatenate([hop_log_s[:1, 0], hop_log_s[:, 3]])    # (R,)
        # canonical (first) row of each chain position
        eq = cm[:, None] == cm[None, :]
        canon = jnp.argmax(eq, axis=1).astype(jnp.int32)
        canon = jnp.where(cm >= 0, canon, rows)
        is_canon = canon == rows

        cms = jnp.maximum(cm, 0)
        catoms = topo.mol_atoms[cms]                                 # (R, A)
        ctype = jnp.where(catoms >= 0,
                          topo.atom_type[jnp.maximum(catoms, 0)], -1)
        cmt = topo.mol_mtype[cms]
        cnat = topo.mol_natom[cms]

        def do_hop(i, st):
            catoms, ctype, cmt, cnat = st
            proton, heavy_a = hop_log_s[i, 1], hop_log_s[i, 4]
            d_row, a_row = canon[i], canon[i + 1]

            # ---- donor loses the proton: compact its slot list + conjugate
            datoms, dtypes = catoms[d_row], ctype[d_row]
            s_p = jnp.argmax(datoms == proton).astype(jnp.int32)
            sh_a = jnp.roll(datoms, -1).at[A - 1].set(-1)
            sh_t = jnp.roll(dtypes, -1).at[A - 1].set(-1)
            datoms_n = jnp.where(slots < s_p, datoms, sh_a)
            dtypes_n = jnp.where(slots < s_p, dtypes, sh_t)
            dtypes_n = jnp.where(datoms_n >= 0,
                                 evb.conjugate_atype[jnp.maximum(dtypes_n, 0)],
                                 -1)
            d_base = mt.conjugate_mtype[cmt[d_row]]
            datoms_n, dtypes_n = _reorder_to_template(datoms_n, dtypes_n,
                                                      mt.atype[d_base])
            catoms = catoms.at[d_row].set(datoms_n)
            ctype = ctype.at[d_row].set(dtypes_n)
            cmt = cmt.at[d_row].set(d_base)
            cnat = cnat.at[d_row].add(-1)

            # ---- acceptor gains the proton at its last slot + conjugates
            n_a = cnat[a_row]
            aatoms = catoms[a_row].at[n_a].set(proton)
            acid_t = mt.conjugate_mtype[cmt[a_row]]
            atypes = jnp.where(aatoms >= 0,
                               evb.conjugate_atype[jnp.maximum(ctype[a_row],
                                                               0)], -1)
            atypes = jnp.where(aatoms == proton, mt.proton_atype[acid_t],
                               atypes)
            atypes = jnp.where(aatoms == heavy_a, mt.heavy_atype[acid_t],
                               atypes)

            # ---- reorder acceptor slots to the acid template (greedy
            # stable match, identical to apply_hop)
            aatoms, atypes = _reorder_to_template(aatoms, atypes,
                                                  mt.atype[acid_t])
            catoms = catoms.at[a_row].set(aatoms)
            ctype = ctype.at[a_row].set(atypes)
            cmt = cmt.at[a_row].set(acid_t)
            cnat = cnat.at[a_row].add(1)
            return catoms, ctype, cmt, cnat

        st = (catoms, ctype, cmt, cnat)
        for i in range(C):
            new = do_hop(i, st)
            keep = i < n_hops_s
            st = jax.tree_util.tree_map(
                lambda n, o: jnp.where(keep, n, o), new, st)
        catoms, ctype, cmt, cnat = st

        # ---- materialize: one masked scatter per full-size array
        row_ok = (cm >= 0) & is_canon
        amask = (row_ok[:, None] & (catoms >= 0)).reshape(-1)
        aidx = jnp.maximum(catoms, 0).reshape(-1)
        tvals = jnp.maximum(ctype, 0).reshape(-1)

        atom_type = _scatter_update(topo.atom_type, aidx, tvals, amask)
        charge = _scatter_update(topo.charge, aidx,
                                 ff.charge_by_type[tvals], amask)
        atom_slot = _scatter_update(
            topo.atom_slot, aidx,
            jnp.broadcast_to(slots[None], (R, A)).reshape(-1), amask)
        atom_mol = _scatter_update(
            topo.atom_mol, aidx,
            jnp.broadcast_to(cms[:, None], (R, A)).reshape(-1), amask)
        mol_mtype = _scatter_update(topo.mol_mtype, cms, cmt, row_ok)
        mol_natom = _scatter_update(topo.mol_natom, cms, cnat, row_ok)
        mol_atoms = topo.mol_atoms.at[cms].add(
            jnp.where(row_ok[:, None], catoms - topo.mol_atoms[cms], 0))
        hyd = jnp.where(n_hops_s > 0, hydronium_s, topo.hydronium_mol)

        t = Topology(mol_mtype=mol_mtype, mol_natom=mol_natom,
                     mol_atoms=mol_atoms, atom_mol=atom_mol,
                     atom_slot=atom_slot, atom_type=atom_type, charge=charge,
                     hydronium_mol=hyd.astype(jnp.int32))
        changed, cmask = _changed_atoms_one(topo, hop_log_s)
        return t, changed, cmask

    topo_b, changed, cmask = jax.vmap(build_one)(
        dset.hop_log, dset.n_hops, dset.hydronium_of)
    return DiabatBatch(dset=dset, topo=topo_b, changed_atoms=changed,
                       changed_mask=cmask)
