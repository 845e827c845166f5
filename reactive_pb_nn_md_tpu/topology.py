"""System compilation: parsers' raw output -> static device pytrees.

TPU-first design: all molecular structure is expressed as fixed-shape index
tensors so that every downstream computation is a gather/compute/scatter
under jit.  The reference's pointer-and-allocatable representation
(glob_v.f90:157-337) maps to:

  ForceField     dense per-type parameter tables        [T,...]
  MolTypeTable   padded per-molecule-type templates     [MT, A, ...]
  EvbParams      dense EVB interaction tables           [T,T,T,...]
  Topology       the *dynamic* molecular assignment     [M, A] / [N]
                 (this is the only thing a proton hop changes)

Padding convention: invalid atom slots hold index -1; gathers use
clamp-to-0 + mask.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

from .io.gro import GroFrame
from .io.ffpmt import RawForceField, compile_vdw_tables
from .io.topfile import TopologyFileRaw
from .io.simpmt import SimConfig
from .utils.dtypes import default_float


# --------------------------------------------------------------------------
# pytree containers
# --------------------------------------------------------------------------

@struct.dataclass
class ForceField:
    charge_by_type: jnp.ndarray          # (T,)
    mass_by_type: jnp.ndarray            # (T,)
    freeze_by_type: jnp.ndarray          # (T,) int32
    vdw_type: jnp.ndarray                # (T,T) int32: 0 LJ, 1 SAPT, -1 none
    vdw_params: jnp.ndarray              # (T,T,6)
    vdw_params_14: jnp.ndarray           # (T,T,6)
    bond_func: jnp.ndarray               # (T,T) int32
    bond_params: jnp.ndarray             # (T,T,3)
    angle_func: jnp.ndarray              # (T,T,T) int32
    angle_params: jnp.ndarray            # (T,T,T,2)
    dihedral_func: jnp.ndarray           # (T,T,T,T) int32
    dihedral_params: jnp.ndarray         # (T,T,T,T,6)
    atype_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())


@struct.dataclass
class MolTypeTable:
    natom: jnp.ndarray                   # (MT,) int32
    atype: jnp.ndarray                   # (MT,A) int32, -1 pad
    mass: jnp.ndarray                    # (MT,A)
    bonds: jnp.ndarray                   # (MT,B,2) int32, -1 pad
    angles: jnp.ndarray                  # (MT,G,3)
    dihedrals: jnp.ndarray               # (MT,D,4)
    excl_code: jnp.ndarray               # (MT,A,A) int32 {0,1,2}
    reactive_protons: jnp.ndarray        # (MT,A) int32
    reactive_bases: jnp.ndarray          # (MT,A) int32
    is_acid: jnp.ndarray                 # (MT,) int32
    is_base: jnp.ndarray                 # (MT,) int32
    conjugate_mtype: jnp.ndarray         # (MT,) int32 (identity if not reactive)
    proton_atype: jnp.ndarray            # (MT,) int32, -1 if not acid
    heavy_atype: jnp.ndarray             # (MT,) int32, -1 if not acid
    reference_energy: jnp.ndarray        # (MT,)
    bonded_heavy_slot: jnp.ndarray       # (MT,A) int32: template-bonded
                                         # partner slot of each H slot, -1
    heavy_slot: jnp.ndarray              # (MT,) int32: first template slot
                                         # whose type is the acid heavy type
                                         # (of this type if acid, of the
                                         # conjugate acid if base), -1 else
    # ---- per-template COMPILED parameter tables: the type tuple of every
    # bonded term / intra pair is static per template, so the runtime
    # (T,T,..)-table lookups (serialized tiny gathers on TPU) collapse
    # into one row gather of these packed float tables
    proton_slots: jnp.ndarray = None     # (MT, P) int32: template slots
                                         # with reactive protons, -1 pad
                                         # (P = max count over types; the
                                         # enumeration expands only these
                                         # rows instead of all A slots)
    base_atype: jnp.ndarray = None       # (T,) int32 reactive-base flag by
                                         # ATOM TYPE -- None when a type's
                                         # base flag differs across
                                         # templates (then enumerate falls
                                         # back to the (mtype, slot) table)
    bond_tab: jnp.ndarray = None         # (MT, B, 4)  func + 3 params
    angle_tab: jnp.ndarray = None        # (MT, G, 3)  func + 2 params
    dihedral_tab: jnp.ndarray = None     # (MT, D, 7)  func + 6 params
    intra_tab: jnp.ndarray = None        # (MT, P2, 13) vtype + 6 + 6 params
                                         # over the triu(A,1) slot pairs
    mtype_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())


@struct.dataclass
class EvbParams:
    conjugate_atype: jnp.ndarray         # (T,) int32, identity default
    exchange_q_atype: jnp.ndarray        # (T,)
    exchange_q_proton: jnp.ndarray       # (MT,MT)
    da_mask: jnp.ndarray                 # (T,T,T) bool  (acceptor, heavy, H)
    da_params: jnp.ndarray               # (T,T,T,6)  B b d0 b' rs rc
    pa_mask: jnp.ndarray                 # (T,T) bool (acceptor, H)
    pa_params: jnp.ndarray               # (T,T,5)  C c d0 rs rc
    cpl_func: jnp.ndarray                # (T,T,T) int32, 0 = none
    cpl_params: jnp.ndarray              # (T,T,T,10)
    type_options: jnp.ndarray = None     # (T,O) int32: every type an atom of
                                         # base type t can take in any diabat
                                         # (identity, conjugate, proton /
                                         # heavy overrides); -1 padded.
                                         # Drives the field-decomposition
                                         # delta diagonals.
    # PB-NN coupling (function type 3): MLP weights, shared across triples
    nn_params: Optional[dict] = None


@struct.dataclass
class Topology:
    """Dynamic molecular assignment. A proton hop permutes nothing in memory;
    it only rewrites these index/charge arrays (contrast with the reference's
    array-shifting machinery, ms_evb.f90:2677-2840)."""
    mol_mtype: jnp.ndarray               # (M,) int32
    mol_natom: jnp.ndarray               # (M,) int32
    mol_atoms: jnp.ndarray               # (M,A) int32, -1 pad
    atom_mol: jnp.ndarray                # (N,) int32
    atom_slot: jnp.ndarray               # (N,) int32
    atom_type: jnp.ndarray               # (N,) int32
    charge: jnp.ndarray                  # (N,)
    hydronium_mol: jnp.ndarray           # () int32, -1 if non-reactive


@struct.dataclass
class System:
    """Immutable per-run data + static configuration."""
    ff: ForceField
    mt: MolTypeTable
    evb: Optional[EvbParams]
    mass: jnp.ndarray                    # (N,) constant across diabats
    # static configuration (specializes the jitted programs)
    n_atoms: int = struct.field(pytree_node=False, default=0)
    n_mole: int = struct.field(pytree_node=False, default=0)
    max_atoms_per_mol: int = struct.field(pytree_node=False, default=0)
    real_space_cutoff: float = struct.field(pytree_node=False, default=0.0)
    verlet_cutoff: float = struct.field(pytree_node=False, default=0.0)
    alpha_sqrt: float = struct.field(pytree_node=False, default=0.3)
    pme_grid: int = struct.field(pytree_node=False, default=60)
    spline_order: int = struct.field(pytree_node=False, default=6)
    n_exclusions: int = struct.field(pytree_node=False, default=2)
    evb_max_states: int = struct.field(pytree_node=False, default=80)
    evb_max_chain: int = struct.field(pytree_node=False, default=3)
    evb_max_neighbors: int = struct.field(pytree_node=False, default=10)
    # hop-search thresholds (runtime keys; reference compile-time
    # constants glob_v.f90:54-55)
    evb_first_solvation_cutoff: float = struct.field(
        pytree_node=False, default=5.0)
    evb_reactive_pair_distance: float = struct.field(
        pytree_node=False, default=2.5)
    # small-tier cap for the two-tier state evaluation
    # (evb.hamiltonian.small_state_tier): -1 auto, 0 off, >0 explicit
    evb_small_states: int = struct.field(pytree_node=False, default=-1)
    ms_evb: bool = struct.field(pytree_node=False, default=False)
    has_sapt: bool = struct.field(pytree_node=False, default=False)
    eigensolver: str = struct.field(pytree_node=False, default="eigh")
    # Kahan-compensated integrator carries (md/integrators.two_sum_add)
    compensated_sum: bool = struct.field(pytree_node=False, default=False)
    # static cell grid for the fused Pallas real-space pair kernel
    # (ops/pallas/realspace_pair.py); () = use the XLA half-list path
    rs_cells: tuple = struct.field(pytree_node=False, default=())
    # static per-slab capacity for the slab-binned Pallas PME spread
    # (ops/pallas/pme_slab.py); 0 = use the per-atom spread kernel
    pme_scap: int = struct.field(pytree_node=False, default=0)
    # max outer switch radius over the EVB repulsion tables (da rc,
    # pa rc); gates the candidate-row repulsion path (repulsion rows are
    # covered by the neighbor rows iff this <= real_space_cutoff)
    evb_rep_rc_max: float = struct.field(pytree_node=False, default=0.0)


@struct.dataclass
class State:
    x: jnp.ndarray                       # (N,3) Angstrom
    v: jnp.ndarray                       # (N,3) A/ps
    box: jnp.ndarray                     # (3,3)
    key: jnp.ndarray                     # PRNG key
    step: jnp.ndarray                    # () int32


# --------------------------------------------------------------------------
# exclusion generation (mirrors intra_bonded_interactions.f90:574-660)
# --------------------------------------------------------------------------

def generate_exclusions(n_atom, bonds, n_exclusions, explicit=()):
    """Exclusion codes per atom pair: 1 = excluded, 2 = special 1-4,
    0 = normal. Self pairs are 1."""
    code = np.zeros((n_atom, n_atom), dtype=np.int32)
    for (i, j) in explicit:
        code[i, j] = code[j, i] = 1
    np.fill_diagonal(code, 1)

    adj = np.zeros((n_atom, n_atom), dtype=bool)
    for (i, j) in bonds:
        adj[i, j] = adj[j, i] = True

    # BFS distances over the bond graph
    dist = np.full((n_atom, n_atom), 10 ** 6, dtype=np.int64)
    np.fill_diagonal(dist, 0)
    for start in range(n_atom):
        frontier = [start]
        d = 0
        seen = {start}
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for v in np.nonzero(adj[u])[0]:
                    if v not in seen:
                        seen.add(v)
                        dist[start, v] = d
                        nxt.append(v)
            frontier = nxt

    max_search = max(n_exclusions, 3)
    for i in range(n_atom):
        for j in range(n_atom):
            if i == j:
                continue
            d = dist[i, j]
            if d <= max_search:
                if d == 3 and n_exclusions < 3 and code[i, j] != 1:
                    code[i, j] = 2
                elif d <= n_exclusions:
                    code[i, j] = 1
    return code


# --------------------------------------------------------------------------
# system building
# --------------------------------------------------------------------------

def build_system(gro: GroFrame, ff_raw: RawForceField, top_raw: TopologyFileRaw,
                 cfg: SimConfig):
    """Compile parsed inputs into (System, Topology, State-positions)."""
    from .utils.dtypes import set_precision
    set_precision(cfg.precision)
    f = default_float()
    T = ff_raw.n_types
    names = ff_raw.names

    def atype_id(name):
        try:
            return names.index(name)
        except ValueError:
            raise ValueError(f"atom type {name!r} not in force-field file")

    # ---------------- force field tables
    vdw_type, vdw_params, vdw_params_14 = compile_vdw_tables(
        ff_raw, cfg.lj_comb_rule)

    bond_func = np.zeros((T, T), dtype=np.int32)
    bond_params = np.zeros((T, T, 3))
    for (a, b), (func, params) in top_raw.bond_types.items():
        ia, ib = atype_id(a), atype_id(b)
        bond_func[ia, ib] = func
        bond_params[ia, ib] = params

    angle_func = np.zeros((T, T, T), dtype=np.int32)
    angle_params = np.zeros((T, T, T, 2))
    for (a, b, c), (func, params) in top_raw.angle_types.items():
        ia, ib, ic = atype_id(a), atype_id(b), atype_id(c)
        angle_func[ia, ib, ic] = func
        angle_params[ia, ib, ic] = params

    dihedral_func = np.zeros((T, T, T, T), dtype=np.int32)
    dihedral_params = np.zeros((T, T, T, T, 6))
    for (a, b, c, d), (func, params) in top_raw.dihedral_types.items():
        ia, ib, ic, id_ = atype_id(a), atype_id(b), atype_id(c), atype_id(d)
        dihedral_func[ia, ib, ic, id_] = func
        dihedral_params[ia, ib, ic, id_] = params

    # masses per atom type, gathered from moleculetype [ atoms ] sections
    mass_by_type = np.full((T,), -1.0)
    for mt in top_raw.molecule_types:
        for aname, m in zip(mt.atom_names, mt.masses):
            ti = atype_id(aname)
            if mass_by_type[ti] < 0:
                mass_by_type[ti] = m
            elif abs(mass_by_type[ti] - m) > 1e-6:
                raise ValueError(f"inconsistent mass for atom type {aname}")

    ff = ForceField(
        charge_by_type=jnp.asarray(ff_raw.charge, f),
        mass_by_type=jnp.asarray(np.maximum(mass_by_type, 0.0), f),
        freeze_by_type=jnp.asarray(ff_raw.freeze, jnp.int32),
        vdw_type=jnp.asarray(vdw_type, jnp.int32),
        vdw_params=jnp.asarray(vdw_params, f),
        vdw_params_14=jnp.asarray(vdw_params_14, f),
        bond_func=jnp.asarray(bond_func, jnp.int32),
        bond_params=jnp.asarray(bond_params, f),
        angle_func=jnp.asarray(angle_func, jnp.int32),
        angle_params=jnp.asarray(angle_params, f),
        dihedral_func=jnp.asarray(dihedral_func, jnp.int32),
        dihedral_params=jnp.asarray(dihedral_params, f),
        atype_names=tuple(names),
    )

    # ---------------- molecule type templates
    mtypes = top_raw.molecule_types
    mtype_names = [m.name for m in mtypes]
    MT = len(mtypes)
    A = max(m.n_atom for m in mtypes)
    B = max(max((len(m.bonds) for m in mtypes)), 1)
    G = max(max((len(m.angles) for m in mtypes)), 1)
    D = max(max((len(m.dihedrals) for m in mtypes)), 1)

    natom = np.array([m.n_atom for m in mtypes], dtype=np.int32)
    atype = np.full((MT, A), -1, dtype=np.int32)
    mmass = np.zeros((MT, A))
    bonds = np.full((MT, B, 2), -1, dtype=np.int32)
    angles = np.full((MT, G, 3), -1, dtype=np.int32)
    dihedrals = np.full((MT, D, 4), -1, dtype=np.int32)
    excl = np.ones((MT, A, A), dtype=np.int32)

    for k, m in enumerate(mtypes):
        na = m.n_atom
        atype[k, :na] = [atype_id(an) for an in m.atom_names]
        mmass[k, :na] = m.masses
        for ib, bnd in enumerate(m.bonds):
            bonds[k, ib] = bnd
        for ia, ang in enumerate(m.angles):
            angles[k, ia] = ang
        for idd, dih in enumerate(m.dihedrals):
            dihedrals[k, idd] = dih
        excl[k, :na, :na] = generate_exclusions(
            na, m.bonds, cfg.n_exclusions, m.explicit_exclusions)

    def mtype_id(name):
        try:
            return mtype_names.index(name)
        except ValueError:
            raise ValueError(f"molecule type {name!r} not in topology file")

    # ---------------- EVB topology/parameters
    is_acid = np.zeros((MT,), dtype=np.int32)
    is_base = np.zeros((MT,), dtype=np.int32)
    conjugate_mtype = np.arange(MT, dtype=np.int32)
    proton_atype = np.full((MT,), -1, dtype=np.int32)
    heavy_atype = np.full((MT,), -1, dtype=np.int32)
    reference_energy = np.zeros((MT,))
    reactive_protons = np.zeros((MT, A), dtype=np.int32)
    reactive_bases = np.zeros((MT, A), dtype=np.int32)

    evb = None
    rep_rc_max = 0.0
    if top_raw.has_evb and cfg.ms_evb_simulation:
        conjugate_atype = np.arange(T, dtype=np.int32)
        exchange_q_atype = np.zeros((T,))
        exchange_q_proton = np.zeros((MT, MT))
        da_mask = np.zeros((T, T, T), dtype=bool)
        da_params = np.zeros((T, T, T, 6))
        pa_mask = np.zeros((T, T), dtype=bool)
        pa_params = np.zeros((T, T, 5))
        cpl_func = np.zeros((T, T, T), dtype=np.int32)
        cpl_params = np.zeros((T, T, T, 10))

        for name, e in top_raw.reference_energy.items():
            reference_energy[mtype_id(name)] = e
        for (key, params) in top_raw.donor_acceptor:
            i, j, k = (atype_id(x) for x in key)
            da_mask[i, j, k] = True
            da_params[i, j, k] = params
        for (key, params) in top_raw.proton_acceptor:
            i, j = (atype_id(x) for x in key)
            pa_mask[i, j] = True
            pa_params[i, j] = params
        for (key, func, params) in top_raw.diabat_coupling:
            i, j, k = (atype_id(x) for x in key)
            cpl_func[i, j, k] = func
            cpl_params[i, j, k] = params
        for name, q in top_raw.exchange_charge_atomic.items():
            exchange_q_atype[atype_id(name)] = q
        for (n1, n2), q in top_raw.exchange_charge_proton.items():
            exchange_q_proton[mtype_id(n1), mtype_id(n2)] = q
            exchange_q_proton[mtype_id(n2), mtype_id(n1)] = q

        for pair in top_raw.evb_pairs:
            ia, ib = mtype_id(pair.acid_name), mtype_id(pair.base_name)
            is_acid[ia] = 1
            is_base[ib] = 1
            conjugate_mtype[ia] = ib
            conjugate_mtype[ib] = ia
            proton_atype[ia] = atype_id(pair.proton_type)
            heavy_atype[ia] = atype_id(pair.heavy_type)
            for idx, v in pair.acid_reactive_protons.items():
                reactive_protons[ia, idx] = v
            for idx, v in pair.base_reactive_protons.items():
                reactive_protons[ib, idx] = v
            for idx, v in pair.acid_acceptor_atoms.items():
                reactive_bases[ia, idx] = v
            for idx, v in pair.base_acceptor_atoms.items():
                reactive_bases[ib, idx] = v
            # order matters: later lines overwrite (see example .top comment)
            for (a1, a2) in pair.conjugate_atoms:
                t1, t2 = atype_id(a1), atype_id(a2)
                conjugate_atype[t1] = t2
                conjugate_atype[t2] = t1

        # The reference REQUIRES acidic protons stored last
        # (evb_consistency_checks, ms_evb.f90:144-167) because its
        # array-shifting topology mutation depends on slot order; the
        # index-rewrite design here identifies the transferred proton by
        # its hop-log global index, so any template slot order is valid
        # (tested by test_coupling_invariant_to_template_slot_order).
        # Only require that every acid actually HAS a reactive proton.
        for k in range(MT):
            if is_acid[k] and not any(
                    reactive_protons[k, i] == 1 for i in range(natom[k])):
                raise ValueError(f"acid molecule {mtype_names[k]} has no "
                                 f"reactive proton")

        # per-type option sets: every type an atom can take in a diabat
        # (conservative closure of the conjugation/override algebra)
        opt_sets = [[t] for t in range(T)]
        proton_types = sorted({int(proton_atype[a]) for a in range(MT)
                               if is_acid[a] and proton_atype[a] >= 0})
        for t in range(T):
            def _add(v):
                if v >= 0 and v not in opt_sets[t]:
                    opt_sets[t].append(int(v))
            _add(conjugate_atype[t])
            _add(conjugate_atype[conjugate_atype[t]])
            # reactive-proton types can become any acid's proton type
            is_rp = any(reactive_protons[m, i] == 1 and atype[m, i] == t
                        for m in range(MT) for i in range(natom[m]))
            if is_rp:
                for p in proton_types:
                    _add(p)
                    _add(conjugate_atype[p])
            # reactive-base atoms can take the protonated heavy type
            for m in range(MT):
                for i in range(natom[m]):
                    if reactive_bases[m, i] == 1 and atype[m, i] == t:
                        acid = conjugate_mtype[m] if not is_acid[m] else m
                        _add(heavy_atype[acid])
                        _add(conjugate_atype[heavy_atype[acid]])
        O = max(len(s) for s in opt_sets)
        type_options = np.full((T, O), -1, dtype=np.int32)
        for t, s in enumerate(opt_sets):
            type_options[t, :len(s)] = s

        rep_rcs = ([float(da_params[da_mask][:, 5].max())]
                   if da_mask.any() else []) \
            + ([float(pa_params[pa_mask][:, 4].max())]
               if pa_mask.any() else [])
        rep_rc_max = max(rep_rcs) if rep_rcs else 0.0

        evb = EvbParams(
            type_options=jnp.asarray(type_options),
            conjugate_atype=jnp.asarray(conjugate_atype, jnp.int32),
            exchange_q_atype=jnp.asarray(exchange_q_atype, f),
            exchange_q_proton=jnp.asarray(exchange_q_proton, f),
            da_mask=jnp.asarray(da_mask),
            da_params=jnp.asarray(da_params, f),
            pa_mask=jnp.asarray(pa_mask),
            pa_params=jnp.asarray(pa_params, f),
            cpl_func=jnp.asarray(cpl_func, jnp.int32),
            cpl_params=jnp.asarray(cpl_params, f),
        )

    # template-bonded partner slot (find_bonded_atom_hydrogen,
    # general_routines.f90:575) and heavy-atom template slot
    # (get_heavy_atom_transfer_acid/base, ms_evb.f90:2888-2938)
    bonded_heavy_slot = np.full((MT, A), -1, dtype=np.int32)
    heavy_slot = np.full((MT,), -1, dtype=np.int32)
    for k, m in enumerate(mtypes):
        for (i, j) in m.bonds:
            if bonded_heavy_slot[k, i] < 0:
                bonded_heavy_slot[k, i] = j
            if bonded_heavy_slot[k, j] < 0:
                bonded_heavy_slot[k, j] = i
        acid_k = k if is_acid[k] else conjugate_mtype[k]
        if proton_atype[acid_k] >= 0:
            # search THIS type's own template: an acid holds the acid heavy
            # type, a base holds its conjugate (deprotonated) heavy type.
            # Indexing the acid template for a base molecule is only valid
            # for protons-last templates (which the reference requires,
            # ms_evb.f90:144-167 -- this engine supports any slot order).
            t_heavy = heavy_atype[acid_k]
            if not is_acid[k]:
                t_heavy = conjugate_atype[t_heavy]
            for i in range(natom[k]):
                if atype[k, i] == t_heavy:
                    heavy_slot[k] = i
                    break

    # ---------------- per-template compiled parameter tables: the type
    # tuple of every bonded term / intra slot pair is STATIC per template
    # (diabat reorders guarantee template type order), so the runtime
    # (T,T,..)-table lookups -- serialized tiny gathers on TPU -- become
    # one packed row gather per term
    MT_n = MT
    B_n, G_n, D_n = bonds.shape[1], angles.shape[1], dihedrals.shape[1]
    bond_tab = np.zeros((MT_n, B_n, 4))
    angle_tab = np.zeros((MT_n, G_n, 3))
    dihedral_tab = np.zeros((MT_n, D_n, 7))
    iu_np, ju_np = np.triu_indices(A, 1)
    P2 = iu_np.shape[0]
    intra_tab = np.zeros((MT_n, P2, 13))
    intra_tab[:, :, 0] = -1.0
    for k in range(MT_n):
        for s in range(B_n):
            i0, j0 = bonds[k, s]
            if i0 < 0:
                continue
            ti, tj = atype[k, i0], atype[k, j0]
            bond_tab[k, s, 0] = bond_func[ti, tj]
            bond_tab[k, s, 1:] = bond_params[ti, tj]
        for s in range(G_n):
            i0, j0, k0 = angles[k, s]
            if i0 < 0:
                continue
            tt = (atype[k, i0], atype[k, j0], atype[k, k0])
            angle_tab[k, s, 0] = angle_func[tt]
            angle_tab[k, s, 1:] = angle_params[tt]
        for s in range(D_n):
            i0, j0, k0, l0 = dihedrals[k, s]
            if i0 < 0:
                continue
            tt = (atype[k, i0], atype[k, j0], atype[k, k0], atype[k, l0])
            dihedral_tab[k, s, 0] = dihedral_func[tt]
            dihedral_tab[k, s, 1:] = dihedral_params[tt]
        for s in range(P2):
            i0, j0 = iu_np[s], ju_np[s]
            if j0 >= natom[k]:
                continue
            ti, tj = atype[k, i0], atype[k, j0]
            intra_tab[k, s, 0] = vdw_type[ti, tj]
            intra_tab[k, s, 1:7] = vdw_params[ti, tj]
            intra_tab[k, s, 7:13] = vdw_params_14[ti, tj]

    P = max(1, int((reactive_protons > 0).sum(axis=1).max()))
    proton_slots = np.full((MT, P), -1, dtype=np.int32)
    for k in range(MT):
        sl = np.nonzero(reactive_protons[k] > 0)[0]
        proton_slots[k, :len(sl)] = sl

    # reactive-base flag by atom type (valid when consistent across
    # templates): turns enumerate's per-atom (mtype, slot) double gather
    # into a one-hot matvec
    base_by_atype = np.zeros((T,), dtype=np.int32)
    base_ok = True
    seen_base = {}
    for k in range(MT):
        for i in range(int(natom[k])):
            t, v = int(atype[k, i]), int(reactive_bases[k, i] > 0)
            if seen_base.setdefault(t, v) != v:
                base_ok = False
            if v:
                base_by_atype[t] = 1

    mt = MolTypeTable(
        proton_slots=jnp.asarray(proton_slots),
        base_atype=jnp.asarray(base_by_atype) if base_ok else None,
        bond_tab=jnp.asarray(bond_tab, f),
        angle_tab=jnp.asarray(angle_tab, f),
        dihedral_tab=jnp.asarray(dihedral_tab, f),
        intra_tab=jnp.asarray(intra_tab, f),
        natom=jnp.asarray(natom),
        atype=jnp.asarray(atype),
        mass=jnp.asarray(mmass, f),
        bonds=jnp.asarray(bonds),
        angles=jnp.asarray(angles),
        dihedrals=jnp.asarray(dihedrals),
        excl_code=jnp.asarray(excl),
        reactive_protons=jnp.asarray(reactive_protons),
        reactive_bases=jnp.asarray(reactive_bases),
        is_acid=jnp.asarray(is_acid),
        is_base=jnp.asarray(is_base),
        conjugate_mtype=jnp.asarray(conjugate_mtype),
        proton_atype=jnp.asarray(proton_atype),
        heavy_atype=jnp.asarray(heavy_atype),
        reference_energy=jnp.asarray(reference_energy, f),
        bonded_heavy_slot=jnp.asarray(bonded_heavy_slot),
        heavy_slot=jnp.asarray(heavy_slot),
        mtype_names=tuple(mtype_names),
    )

    # ---------------- per-configuration topology from the .gro frame
    M = gro.n_mole
    N = gro.n_atoms
    mol_mtype = np.zeros((M,), dtype=np.int32)
    mol_natom_arr = np.zeros((M,), dtype=np.int32)
    mol_atoms = np.full((M, A), -1, dtype=np.int32)
    atom_mol = np.zeros((N,), dtype=np.int32)
    atom_slot = np.zeros((N,), dtype=np.int32)
    atom_type_arr = np.zeros((N,), dtype=np.int32)

    for m in range(M):
        k = mtype_id(gro.mol_names[m])
        first = int(gro.mol_first_atom[m])
        na = int(gro.mol_natom[m])
        if na != int(natom[k]):
            raise ValueError(
                f"molecule {m} ({gro.mol_names[m]}) has {na} atoms in .gro "
                f"but {int(natom[k])} in topology")
        mol_mtype[m] = k
        mol_natom_arr[m] = na
        mol_atoms[m, :na] = np.arange(first, first + na)
        atom_mol[first:first + na] = m
        atom_slot[first:first + na] = np.arange(na)
        atom_type_arr[first:first + na] = atype[k, :na]
        # cross-check .gro atom names against the template
        for i in range(na):
            if gro.atom_names[first + i] != names[atype[k, i]]:
                raise ValueError(
                    f".gro atom name {gro.atom_names[first + i]!r} does not "
                    f"match topology template {names[atype[k, i]]!r} "
                    f"(molecule {m}, slot {i})")

    charge = np.asarray(ff_raw.charge)[atom_type_arr]
    mass = np.asarray(np.maximum(mass_by_type, 0.0))[atom_type_arr]

    hydronium = -1
    if cfg.ms_evb_simulation:
        acid_mols = [m for m in range(M) if is_acid[mol_mtype[m]]
                     and proton_atype[mol_mtype[m]] >= 0]
        if len(acid_mols) != 1:
            raise ValueError(f"MS-EVB needs exactly one acidic molecule, "
                             f"found {len(acid_mols)}")
        hydronium = acid_mols[0]

    topo = Topology(
        mol_mtype=jnp.asarray(mol_mtype),
        mol_natom=jnp.asarray(mol_natom_arr),
        mol_atoms=jnp.asarray(mol_atoms),
        atom_mol=jnp.asarray(atom_mol),
        atom_slot=jnp.asarray(atom_slot),
        atom_type=jnp.asarray(atom_type_arr),
        charge=jnp.asarray(charge, f),
        hydronium_mol=jnp.asarray(hydronium, jnp.int32),
    )

    system = System(
        ff=ff, mt=mt, evb=evb,
        mass=jnp.asarray(mass, f),
        n_atoms=N, n_mole=M, max_atoms_per_mol=A,
        real_space_cutoff=float(cfg.real_space_cutoff),
        verlet_cutoff=float(cfg.verlet_cutoff),
        alpha_sqrt=float(cfg.alpha_sqrt),
        pme_grid=int(cfg.pme_grid),
        spline_order=int(cfg.spline_order),
        n_exclusions=int(cfg.n_exclusions),
        evb_max_states=int(cfg.evb_max_states),
        evb_max_chain=int(cfg.evb_max_chain),
        evb_max_neighbors=int(cfg.evb_max_neighbors),
        evb_first_solvation_cutoff=float(
            getattr(cfg, "evb_first_solvation_cutoff", 5.0)),
        evb_reactive_pair_distance=float(
            getattr(cfg, "evb_reactive_pair_distance", 2.5)),
        evb_small_states=int(getattr(cfg, "evb_small_states", -1)),
        ms_evb=bool(cfg.ms_evb_simulation),
        has_sapt=bool((vdw_type == 1).any()),
        eigensolver=str(getattr(cfg, "eigensolver", "eigh")),
        compensated_sum=bool(getattr(cfg, "compensated_sum", False)),
        rs_cells=_suggest_rs_cells_safe(N, gro.box, cfg.real_space_cutoff),
        pme_scap=_suggest_slab_cap_safe(N, int(cfg.pme_grid), gro.box),
        evb_rep_rc_max=rep_rc_max,
    )
    return system, topo


def _suggest_slab_cap_safe(n_atoms, K, box=None, order=6):
    from .ops.pallas.pme_slab import suggest_slab_cap
    if box is not None:
        import numpy as _np
        b = _np.asarray(box, dtype=_np.float64)
        if _np.abs(b - _np.diag(_np.diag(b))).max() > 1e-9:
            return 0            # slab kernel assumes a diagonal box; the
                                # XLA spread path is fully general
    if K + order - 1 > 128:     # grid row exceeds the kernel's lane segment
        return 0
    if n_atoms < 48 * K:
        # measured crossover on v5e: below ~50 atoms/slab the per-atom
        # VMEM spread kernel wins (649 atoms/K=32: 0.63 vs 0.68 ms f+bwd);
        # above it the slab kernel wins big (10k/K=64: 2.1 vs 4.1 ms)
        return 0
    try:
        return suggest_slab_cap(n_atoms, K)
    except Exception:  # noqa: BLE001
        return 0


def _suggest_rs_cells_safe(n_atoms, box, cutoff):
    from .ops.pallas.realspace_pair import suggest_rs_cells
    try:
        return suggest_rs_cells(n_atoms, box, cutoff)
    except Exception:  # noqa: BLE001
        return ()
