"""EVB Hamiltonian assembly, diagonalization and Hellmann-Feynman forces.

TPU-first reformulation of construct_evb_hamiltonian /
diagonalize_evb_hamiltonian (ms_evb.f90:181-490):

  * diagonal elements: the per-diabat total energy vmapped over the padded
    state batch.  Reciprocal PME uses one base Q grid plus per-diabat
    delta-Q scatters of only the changed atoms (the TPU analog of the
    reference's incremental modify_Q_grid trick, pme.f90:275-335), then ONE
    batched FFT over all diabats (vs the OpenMP loop over MKL FFTs at
    ms_evb.f90:2019-2090).
  * off-diagonal couplings vmapped over states (parent structure from the
    enumeration).
  * ground state from jnp.linalg.eigh on the padded matrix (inactive states
    parked at a huge, non-degenerate diagonal).
  * forces: F = -d/dx [ c^T H(x) c ] with c = stop_gradient(ground
    eigenvector) -- the Hellmann-Feynman theorem by construction, replacing
    the reference's per-element force store + recursive back-mapping
    (evb_store_forces, ms_evb.f90:2523-2656).
"""

import jax
import jax.numpy as jnp
from flax import struct

from ..topology import System, Topology
from ..models import total as total_mod
from ..models import pme, coupling, repulsion
from .enumerate import enumerate_diabats, DiabatSet
from .topology_ops import build_diabat_topologies, DiabatBatch

# Span of the inactive-state diagonal park ABOVE the principle diagonal
# (relative, not absolute: fp32 eigh accuracy is eps * ||H||, so the park
# must not inflate ||H|| past the point where O(100) couplings drown --
# see assemble_hamiltonian).  1e5 clears any physical gap by ~100x.
INACTIVE_DIAG = 1.0e5


def _recip_batched(x, box, batch: DiabatBatch, system: System, cbw,
                   base_charge):
    """Per-diabat reciprocal energies: base grid + batched delta scatters of
    only the changed atoms + ONE batched FFT."""
    K = system.pme_grid
    Q0 = pme.charge_grid(x, base_charge, box, K, system.spline_order,
                         scap=system.pme_scap)

    def dq_one(topo_d, changed, cmask):
        dq = topo_d.charge[jnp.maximum(changed, 0)] \
            - base_charge[jnp.maximum(changed, 0)]
        return pme.delta_charge_grid(x, dq, changed, cmask, box, K,
                                     system.spline_order)

    dQ = jax.vmap(dq_one)(batch.topo, batch.changed_atoms,
                          batch.changed_mask)              # (S, K, K, K)
    return pme.recip_energy_batched(Q0[None] + dQ, cbw)    # (S,)


def diabat_diagonal_energies_full(x, box, batch: DiabatBatch, system: System,
                                  pairs, cbw, base_charge):
    """Reference implementation: full per-diabat recompute, vmapped.
    Kept as the ground truth for the delta path (tested equal)."""

    def one(topo_d):
        bd = total_mod.energy_no_recip(x, box, topo_d, system, pairs)
        e_rep = repulsion.ms_evb_repulsion(x, box, topo_d, system)
        e_ref = repulsion.reference_energy(topo_d, system)
        return bd, e_rep + e_ref

    bds, extra = jax.vmap(one)(batch.topo)
    e_recip = _recip_batched(x, box, batch, system, cbw, base_charge)
    diag = bds.total + extra + e_recip
    bd0 = jax.tree_util.tree_map(lambda a: a[0], bds)
    return diag, bd0, e_recip


def _chain_mol_deltas(x, box, batch: DiabatBatch, system: System,
                      base_charge, topo0, order_m=None, umol_ok=None,
                      skip_repulsion=False):
    """Per-state deltas of the cheap molecule-local terms: intra nonbonded,
    bonded, Ewald self -- evaluated only for the hop-chain molecules.

    The principle-topology side is state-INDEPENDENT per molecule: when the
    caller passes the changed-molecule superset (order_m, umol_ok), it is
    evaluated ONCE per superset molecule (per_mol sums) and each state's
    subtraction is a tiny (2C, UM) membership contraction -- instead of a
    full vmapped intra+bonded evaluation per state (profiled at ~0.3
    ms/step of serialized small gathers on the flagship config)."""
    from ..utils.constants import CONV_E2A_KJMOL, SQRT_PI
    dset = batch.dset

    e0_mol = None
    if order_m is not None:
        ie0, iv0 = total_mod.intra_nonbonded(x, box, topo0, system,
                                             order_m, umol_ok, per_mol=True)
        b0 = total_mod.bonded.bonded_energies(x, box, topo0, system,
                                              order_m, umol_ok, per_mol=True)
        e0_mol = ie0 + iv0 + b0[0] + b0[1] + b0[2]          # (UM,)

    def one(topo_d, changed, cmask, hop_log_s):
        mols = jnp.concatenate([hop_log_s[:, 0], hop_log_s[:, 3]])
        mvalid = mols >= 0
        eq = mols[:, None] == mols[None, :]
        seen = jnp.any(jnp.tril(eq, -1) & mvalid[None, :], axis=1)
        mvalid = mvalid & ~seen

        ie_d, iv_d = total_mod.intra_nonbonded(x, box, topo_d, system,
                                               mols, mvalid)
        b_d = total_mod.bonded.bonded_energies(x, box, topo_d, system,
                                               mols, mvalid)
        if e0_mol is None:
            ie_0, iv_0 = total_mod.intra_nonbonded(x, box, topo0, system,
                                                   mols, mvalid)
            b_0 = total_mod.bonded.bonded_energies(x, box, topo0, system,
                                                   mols, mvalid)
            e_0 = ie_0 + iv_0 + sum(b_0)
        else:
            # every chain molecule is in the superset by construction
            memb = (mols[:, None] == order_m[None, :]) \
                & mvalid[:, None] & umol_ok[None, :]        # (2C, UM)
            e_0 = jnp.sum(jnp.where(memb, e0_mol[None, :], 0.0))
        csafe = jnp.maximum(changed, 0)
        q_d = topo_d.charge[csafe]
        q_0 = base_charge[csafe]
        dself = -system.alpha_sqrt / SQRT_PI * CONV_E2A_KJMOL * jnp.sum(
            jnp.where(cmask, q_d * q_d - q_0 * q_0, 0.0))
        e_ref = repulsion.reference_energy(topo_d, system)
        if not skip_repulsion:
            # dense O(N) sweep; the cell-table path computes repulsion on
            # candidate rows instead (ms_evb_repulsion_batched_domain)
            e_ref = e_ref + repulsion.ms_evb_repulsion(x, box, topo_d,
                                                       system)
        return ((ie_d + iv_d + sum(b_d)) - e_0 + dself), e_ref

    return jax.vmap(one)(batch.topo, batch.changed_atoms,
                         batch.changed_mask, dset.hop_log)


def diabat_diagonal_energies(x, box, batch: DiabatBatch, system: System,
                             pairs, cbw, base_charge, topo0, full_idx,
                             xa_pc0=None):
    """Field decomposition of the diagonals.

    The real-space delta of diabat i against the principle topology only
    involves atoms of the changed-molecule superset U (every molecule in
    any hop chain, |U| <= S molecules).  For a pair (u in U, j outside U),
    j's charge/type/molecule are state-independent AND the pair stays
    inter-molecular in every state (u's molecule membership only moves
    within U), so

        dE_el,i  = sum_u (q_i[u] - q_0[u]) * Phi_el[u],
        Phi_el[u] = sum_{j not in U} erfc-kernel(r_uj) q_0[j]

    with the state-independent potential Phi computed ONCE; the vdW analog
    uses per-atom type-option potentials Phi_vdw[u, o] (an atom can only
    take the few types in evb.type_options).  Pairs inside U x U are
    handled by dense per-option kernels contracted per state on the MXU.
    No per-state gathers remain -- the profiled ~20 ms/step of serialized
    TPU gathers becomes a handful of small matmuls.

    This is the batched analog of the reference's O(N) incremental diabat
    updates (ms_evb.f90:1421-1559).  Verified equal to the full recompute
    (values and gradients) by tests/test_delta_diag.py."""
    from ..models import nonbonded
    from ..ops.lookup import pair_lookup
    from ..utils import pbc

    from ..ops import neighbors as nbr_mod
    dset = batch.dset
    S = system.evb_max_states
    M = system.n_mole
    A = system.max_atoms_per_mol
    N = system.n_atoms
    on_demand = isinstance(full_idx, nbr_mod.CellTable)
    Kf = full_idx.row_cap if on_demand else full_idx.shape[1]
    f = x.dtype
    # one-hot / energy contractions run bf16x3 (HIGH) instead of the
    # global f32 (x6) pin: one-hot operands are exact in bf16 and the
    # value operands keep ~21-bit mantissas -- measured indistinguishable
    # from f32 on the delta==full equality tests
    hi = jax.lax.Precision.HIGH

    bd0 = total_mod.energy_no_recip(x, box, topo0, system, pairs,
                                    xa_pc=xa_pc0)

    # ---------------- changed-molecule superset U (indices constant wrt x)
    mols_all = jnp.concatenate(
        [dset.hop_log[:, :, 0], dset.hop_log[:, :, 3]], axis=1).reshape(-1)
    in_U = jnp.zeros((M,), jnp.int32).at[jnp.maximum(mols_all, 0)].max(
        (mols_all >= 0).astype(jnp.int32))
    # force-include the principle hydronium: the candidate-row repulsion
    # needs state 0's acid rows even when no hop was enumerated.  The
    # union of chain molecules is <= S including it (tree enumeration:
    # each non-principle state adds at most one new acceptor molecule)
    in_U = in_U.at[jnp.maximum(topo0.hydronium_mol, 0)].max(
        jnp.where(topo0.hydronium_mol >= 0, 1, 0))
    UM = min(S, M)
    order_m = jnp.argsort(-in_U, stable=True)[:UM].astype(jnp.int32)
    umol_ok = in_U[order_m] > 0
    ua_mat = topo0.mol_atoms[order_m]                      # (UM, A)
    ua_mask = (umol_ok[:, None] & (ua_mat >= 0)).reshape(-1)
    ua = jnp.maximum(ua_mat, 0).reshape(-1)                # (U,)
    U = ua.shape[0]

    pos_pad = jnp.full((N + 1,), -1, jnp.int32)
    pos_in_U = pos_pad.at[jnp.where(ua_mask, ua, N)].set(
        jnp.arange(U, dtype=jnp.int32))[:N]

    # ---------------- state-independent pair data over U's neighbor rows.
    # Positions and the four x-independent j-side per-atom values are
    # packed into one (N, 7) array -> ONE row gather for the whole sweep
    # (TPU gather cost is per-row; same trick as total.realspace_inter)
    if on_demand:
        # extract ONLY the U rows from the persisted cell table -- the
        # materialized (N, Kf) adjacency (and its top_k over all N rows at
        # every rebuild) has no other consumer on this path
        rows, over_r = nbr_mod.rows_on_demand(
            full_idx, jax.lax.stop_gradient(x), box, ua)   # (U, Kf)
        row_over = jnp.any(over_r & ua_mask)
    else:
        rows = full_idx[ua]                                # (U, Kf)
        row_over = jnp.asarray(False)
    rmask = ua_mask[:, None] & (rows >= 0)
    j = jnp.maximum(rows, 0)
    packed = jnp.concatenate(
        [x, jnp.stack([base_charge.astype(f),
                       topo0.atom_type.astype(f),
                       topo0.atom_mol.astype(f),
                       pos_in_U.astype(f)], axis=1)], axis=1)   # (N, 7)
    pj = packed[j]                                         # (U, Kf, 7)
    xu = x[ua]                                             # (U, 3)
    qj0 = pj[..., 3]
    t0j = jnp.round(pj[..., 4]).astype(jnp.int32)
    mol_j0 = pj[..., 5]
    jU = jnp.round(pj[..., 6]).astype(jnp.int32)           # (U, Kf)
    dr = pbc.min_image(xu[:, None, :] - pj[..., 0:3], box)
    r2 = jnp.sum(dr * dr, -1)
    within = rmask & (r2 < system.real_space_cutoff ** 2)
    r2s = jnp.where(within, r2, 1.0)
    r = jnp.sqrt(r2s)
    out_p = within & (jU < 0)
    uu_p = within & (jU >= 0)
    inter0 = topo0.atom_mol[ua].astype(f)[:, None] != mol_j0

    ke = nonbonded.ewald_real(jnp.ones_like(r), r, system.alpha_sqrt)
    phi_el = jnp.sum(jnp.where(out_p & inter0, ke * qj0, 0.0),
                     axis=1)                               # (U,)

    # vdW out-field per type option
    opts = system.evb.type_options[topo0.atom_type[ua]]    # (U, O)
    O = opts.shape[1]
    t0j_f = t0j.reshape(-1)
    r_f, r2_f = r.reshape(-1), r2s.reshape(-1)
    no14 = jnp.zeros((U * Kf,), bool)

    def vdw_flat(tu_col):
        tu = jnp.broadcast_to(tu_col[:, None], (U, Kf)).reshape(-1)
        vt = pair_lookup(system.ff.vdw_type, tu, t0j_f)
        vp = pair_lookup(system.ff.vdw_params, tu, t0j_f)
        return nonbonded.vdw_pair_energy(
            vt, vp, vp, no14, r_f, r2_f,
            has_sapt=system.has_sapt).reshape(U, Kf)

    phi_vdw = jnp.stack(
        [jnp.sum(jnp.where(out_p & inter0 & (opts[:, o] >= 0)[:, None],
                           vdw_flat(jnp.maximum(opts[:, o], 0)), 0.0),
                 axis=1)
         for o in range(O)], axis=1)                       # (U, O)

    # U-U: per-option-pair vdW kernels + partner one-hot (constant indices)
    jU_safe = jnp.maximum(jU, 0).reshape(-1)
    ohJ = (jU_safe[:, None]
           == jnp.arange(U, dtype=jnp.int32)[None, :]).astype(f)  # (U*Kf, U)
    optsJ = jnp.matmul(ohJ, opts.astype(f),
                       precision=hi).reshape(U, Kf, O)     # partner options

    e_uu = []                                              # (O,O) kernels
    for a in range(O):
        ta = jnp.maximum(opts[:, a], 0)
        row = []
        for b in range(O):
            tb = jnp.round(optsJ[:, :, b]).astype(jnp.int32).reshape(-1)
            tb = jnp.maximum(tb, 0)
            tu = jnp.broadcast_to(ta[:, None], (U, Kf)).reshape(-1)
            vt = pair_lookup(system.ff.vdw_type, tu, tb)
            vp = pair_lookup(system.ff.vdw_params, tu, tb)
            ev = nonbonded.vdw_pair_energy(
                vt, vp, vp, no14, r_f, r2_f,
                has_sapt=system.has_sapt).reshape(U, Kf)
            row.append(jnp.where(uu_p, ev, 0.0))
        e_uu.append(jnp.stack(row))
    e_uu = jnp.stack(e_uu)                                 # (O, O, U, Kf)
    ke_uu = jnp.where(uu_p, ke, 0.0)

    # ---------------- per-state values on U (tiny vmapped gathers)
    def u_vals(topo_d):
        return (topo_d.charge[ua], topo_d.atom_type[ua], topo_d.atom_mol[ua])

    qU, tU, mU = jax.vmap(u_vals)(batch.topo)              # (S, U)
    q0U = base_charge[ua]
    m0U = topo0.atom_mol[ua]
    selU = jnp.argmax(tU[..., None] == opts[None], axis=-1)   # (S, U)
    oh_sel = jax.nn.one_hot(selU, O, dtype=f)              # (S, U, O)

    # out-field deltas
    masked_q = jnp.where(ua_mask[None], qU - q0U[None], 0.0)  # dq (S, U)
    d_el_out = jnp.matmul(masked_q, phi_el, precision=hi)  # (S,)
    d_vdw_out = jnp.einsum("suo,uo->s", oh_sel, phi_vdw, precision=hi) \
        - jnp.sum(phi_vdw[:, 0])

    # U-U per-state values at the partner via one-hot matmuls
    qJ = jnp.matmul(ohJ, qU.T, precision=hi).reshape(U, Kf, S)
    mJ = jnp.matmul(ohJ, mU.astype(f).T, precision=hi).reshape(U, Kf, S)
    sJ = jnp.matmul(ohJ, selU.astype(f).T, precision=hi).reshape(U, Kf, S)
    m0J = jnp.matmul(ohJ, m0U.astype(f), precision=hi).reshape(U, Kf)
    q0J = jnp.matmul(ohJ, q0U, precision=hi).reshape(U, Kf)
    s0J = jnp.zeros((U, Kf), f)                            # sel_0 = 0

    inter_d = mU.T[:, None, :] != mJ                       # (U, Kf, S)
    inter_0uu = (m0U[:, None] != m0J)
    e_el_uu_d = 0.5 * jnp.einsum(
        "uk,uks->s", ke_uu, jnp.where(inter_d, qU.T[:, None, :] * qJ, 0.0),
        precision=hi)
    e_el_uu_0 = 0.5 * jnp.sum(ke_uu * jnp.where(inter_0uu, q0U[:, None]
                                                * q0J, 0.0))

    e_vdw_uu_d = jnp.zeros((S,), f)
    e_vdw_uu_0 = jnp.asarray(0.0, f)
    selU_t = selU.T                                        # (U, S)
    for a in range(O):
        for b in range(O):
            sel_ab = ((selU_t[:, None, :] == a) & (jnp.round(sJ) == b)
                      & inter_d)
            e_vdw_uu_d = e_vdw_uu_d + 0.5 * jnp.einsum(
                "uk,uks->s", e_uu[a, b], sel_ab.astype(f), precision=hi)
            if a == 0 and b == 0:
                e_vdw_uu_0 = 0.5 * jnp.sum(
                    e_uu[0, 0] * inter_0uu.astype(f))

    deltas_rs = (d_el_out + d_vdw_out
                 + (e_el_uu_d - e_el_uu_0)
                 + (e_vdw_uu_d - e_vdw_uu_0))

    # ---------------- molecule-local deltas + EVB repulsion/reference
    use_domain_rep = repulsion.domain_repulsion_active(system, on_demand)
    deltas_mol, extra = _chain_mol_deltas(x, box, batch, system,
                                          base_charge, topo0,
                                          order_m=order_m, umol_ok=umol_ok,
                                          skip_repulsion=use_domain_rep)
    if use_domain_rep:
        extra = extra + repulsion.ms_evb_repulsion_batched_domain(
            box, batch, system, xu, pos_in_U, rmask, pj, tU, ohJ)

    # ---------------- reciprocal space per state: ONE base FFT + one MXU
    # contraction of the per-state delta spectrum (pme.recip_delta_perstate
    # -- no per-diabat FFTs, no materialized per-atom spectrum); exact by
    # linearity of the spreading
    Q0 = pme.charge_grid(x, base_charge, box, system.pme_grid,
                         system.spline_order, scap=system.pme_scap)
    from ..ops.dft import rfft3_fast
    F0 = rfft3_fast(Q0)
    from ..utils.constants import CONV_E2A_KJMOL
    e0 = 0.5 * CONV_E2A_KJMOL * jnp.sum(
        cbw * (F0.real ** 2 + F0.imag ** 2))
    e_recip = e0 + pme.recip_delta_perstate(
        xu, ua_mask, masked_q, box, system.pme_grid,
        system.spline_order, cbw, F0)

    diag = bd0.total + deltas_rs + deltas_mol + extra + e_recip
    return diag, bd0, e_recip, row_over


def coupling_elements(x, box, batch: DiabatBatch, system: System, com0,
                      topo0=None, base_charge=None, xa_pc0=None):
    """H_{parent(d), d} for every non-principle state d.

    com0 is the principle-topology per-molecule COM (computed once per
    step).  A diabat's COMs differ from com0 only for its chain molecules
    (proton membership moved within the chain), so each state patches at
    most 2*C rows via a tiny (2C, A) gather instead of recomputing the
    full (M, A) mass-weighted reduction per state (round-1 profile:
    molecule_com was ~0.22 ms/call, and the old path ran it per state
    under the vmap).

    topo0/base_charge (principle topology) enable the molecule-major Vex
    path: positions+charges grouped (M, A) are gathered ONCE here and the
    per-state sweep is pure broadcast arithmetic + a tiny chain
    correction (coupling._vex_mol_major)."""
    dset = batch.dset
    S = system.evb_max_states
    sidx = jnp.arange(S)
    active = (sidx < dset.n_states) & (sidx > 0)
    from .enumerate import molecule_com

    mol_pack = None
    if topo0 is not None:
        # the SAME traced value energy_no_recip consumes (xa_pc0 from
        # assemble_hamiltonian): one (M*A) row gather and ONE backward
        # scatter serve both consumers (two identical gathers CSE in XLA,
        # their transpose scatters do not)
        pk = xa_pc0 if xa_pc0 is not None \
            else total_mod.mol_sites_packed(x, topo0)      # (M, A, 4)
        mol_pack = (pk[..., 0:3], pk[..., 3], topo0.mol_atoms >= 0)

    def one(topo_d, hop_log_s, n_hops_s, act):
        last = jnp.maximum(n_hops_s - 1, 0)
        donor = hop_log_s[last, 0]
        acceptor = hop_log_s[last, 3]
        proton = hop_log_s[last, 1]
        # hop-log heavy atoms (cols 2/4): the physical donating/accepting
        # oxygens -- a template heavy-slot lookup picks a wrong equivalent
        # oxygen for polyatomic bases (see coupling_element docstring)
        d_heavy = hop_log_s[last, 2]
        a_heavy = hop_log_s[last, 4]

        # chain molecules' COM under this diabat's topology, computed on
        # the tiny 2C-row sub-topology.  The former full (M, 3) per-state
        # COM patch (com0.at[mols].add under the state vmap, an (S, M, 3)
        # copy+scatter per step) is unnecessary: base-pack chain rows
        # cancel exactly between the full and subtraction sweeps of
        # _vex_mol_major, so only these 2C rows -- and the donor/acceptor
        # rows, read from com_chain -- ever need diabat-correct values.
        mols = jnp.concatenate([hop_log_s[:, 0], hop_log_s[:, 3]])  # (2C,)
        mvalid = mols >= 0
        eq = mols[:, None] == mols[None, :]
        seen = jnp.any(jnp.tril(eq, -1) & mvalid[None, :], axis=1)
        mvalid = mvalid & ~seen
        sub = _sub_topology(topo_d, mols)
        com_chain = molecule_com(x, sub, system.mass, box,
                                 mt_mass=system.mt.mass)    # (2C, 3)

        return coupling.coupling_element(x, box, topo_d, system,
                                         donor, acceptor, proton, act,
                                         d_heavy, a_heavy,
                                         com0, mol_pack=mol_pack,
                                         chain=(mols, mvalid, com_chain,
                                                last))

    return jax.vmap(one)(batch.topo, dset.hop_log, dset.n_hops, active)


def _sub_topology(topo_d, mols):
    """A tiny Topology view holding only `mols` rows of the molecule
    tables (for molecule_com on a molecule subset)."""
    msafe = jnp.maximum(mols, 0)
    return topo_d.replace(mol_mtype=topo_d.mol_mtype[msafe],
                          mol_natom=topo_d.mol_natom[msafe],
                          mol_atoms=topo_d.mol_atoms[msafe])


def assemble_hamiltonian(x, box, batch: DiabatBatch, system: System,
                         pairs, cbw, base_charge, topo0, full_idx,
                         com0=None):
    S = system.evb_max_states
    dset = batch.dset
    sidx = jnp.arange(S)
    active = sidx < dset.n_states

    if com0 is None:
        from .enumerate import molecule_com
        com0 = molecule_com(x, topo0, system.mass, box)

    xa_pc0 = total_mod.mol_sites_packed(x, topo0)          # shared pack
    diag, bd0, e_recip, row_over = diabat_diagonal_energies(
        x, box, batch, system, pairs, cbw, base_charge, topo0, full_idx,
        xa_pc0=xa_pc0)
    # fold the principle diabat's reciprocal energy into the reported
    # decomposition (E_elec includes recip+self, reference print_step)
    bds = bd0.replace(elec=bd0.elec + e_recip[0],
                      total=bd0.total + e_recip[0])
    offdiag = coupling_elements(x, box, batch, system, com0,
                                topo0=topo0, base_charge=base_charge,
                                xa_pc0=xa_pc0)

    # park inactive states above the active spectrum, with distinct
    # values.  The park is RELATIVE to the principle diagonal: an absolute
    # 1e8 park poisons fp32 eigh -- eps(||H||) = 1e8 * 1.2e-7 = 12 kJ/mol
    # swamps O(100) couplings and O(200) gaps, and the TPU production path
    # returned c = (1, 0, ...) with NO adiabatic mixing at a Zundel
    # crossing (round-5 find: numpy fp64 gave c = (0.89, 0.43, ...) and
    # the ground state 58 kJ/mol below on the same matrix).  A 1e5 span
    # above E0 keeps parked rows strictly out of the active spectrum
    # (gaps are O(10^2-10^3)) at eps(||H||) ~ 0.02 kJ/mol.
    park = jax.lax.stop_gradient(diag[0]) \
        + INACTIVE_DIAG * (1.0 + sidx / S)
    diag = jnp.where(active, diag, park)
    H = jnp.zeros((S, S), x.dtype)
    H = H.at[sidx, sidx].set(diag)
    par = jnp.where(dset.parent >= 0, dset.parent, 0)
    val = jnp.where((dset.parent >= 0) & active, offdiag, 0.0)
    H = H.at[par, sidx].add(val)
    H = H.at[sidx, par].add(val)
    return H, bds, e_recip, row_over


@struct.dataclass
class EvbResult:
    energy: jnp.ndarray            # adiabatic ground-state energy
    force: jnp.ndarray             # (N, 3)
    eigenvector: jnp.ndarray       # (S,) ground-state coefficients
    n_states: jnp.ndarray
    principle: jnp.ndarray         # () int32 diabat with max |c_i|
    new_hydronium: jnp.ndarray     # () int32
    hamiltonian: jnp.ndarray       # (S, S)
    breakdown: total_mod.EnergyBreakdown   # principle-diabat decomposition
    overflow: jnp.ndarray
    hydronium_of: jnp.ndarray      # (S,) acid molecule of each diabat
    n_hops_of: jnp.ndarray         # (S,) chain length (solvation shell)
    # an on-demand adjacency row exceeded its capacity (cell path);
    # handled by the driver's NEIGHBOR regrow, not the state-cap regrow
    row_overflow: jnp.ndarray = None
    # the principle diabat's topology row, gathered inside the evaluation
    # (under the two-tier cond this lets XLA dead-code-eliminate the
    # padded (S, ...) batch.topo output on the hot path -- the integrator
    # needs only this row)
    principle_topo: object = None


def _eval_at_cap(x, box, topo: Topology, system: System, pairs, cbw,
                 full_idx, com, dset: DiabatSet) -> tuple:
    """Pipeline at cap system.evb_max_states for a given enumeration:
    diabat topologies -> Hamiltonian -> ground state -> H-F forces."""
    batch = build_diabat_topologies(topo, dset, system)
    base_charge = topo.charge

    from ..ops import ground_state as gs

    def etot(xx):
        H, bds, _, row_over = assemble_hamiltonian(
            xx, box, batch, system, pairs, cbw,
            base_charge, topo, full_idx, com0=com)
        Hs = jax.lax.stop_gradient(H)
        if system.eigensolver == "iterative":
            _, c = gs.ground_state(Hs)
        else:
            _, c = gs.ground_state_eigh(Hs)
        c = jax.lax.stop_gradient(c)
        e = c @ H @ c
        return e, (H, c, bds, row_over)

    (energy, (H, c, bds, row_over)), grad = \
        jax.value_and_grad(etot, has_aux=True)(x)

    if dset.row_overflow is not None:
        row_over = row_over | dset.row_overflow
    principle = jnp.argmax(jnp.abs(c))
    new_h = dset.hydronium_of[principle]
    ptopo = jax.tree_util.tree_map(lambda a: a[principle], batch.topo)
    result = EvbResult(
        energy=energy, force=-grad, eigenvector=c, n_states=dset.n_states,
        principle=principle.astype(jnp.int32), new_hydronium=new_h,
        hamiltonian=H, breakdown=bds, overflow=dset.overflow,
        hydronium_of=dset.hydronium_of, n_hops_of=dset.n_hops,
        row_overflow=row_over, principle_topo=ptopo)
    return result, batch


def small_state_tier(system: System) -> int:
    """Effective small-tier cap for the two-tier evaluation; 0 = off.

    evb_small_states on System: -1 auto (48 when the cap is >= 64 --
    sized from the measured equilibrated flagship distribution: n_states
    p50 = 33, p90 = 46, p99 = 56, so ~92% of steps fit the small tier),
    0 disabled, > 0 explicit.

    Auto applies only on non-CPU backends: the tier is a TPU production
    optimization, and XLA:CPU has segfaulted compiling the large eager
    `cond` primitive programs the tier produces at cap 80 (reproduced on
    the round-3 worker; jitted whole-step compiles were fine).  An
    explicit evb_small_states > 0 is honored on any backend."""
    S = system.evb_max_states
    s1 = system.evb_small_states
    if s1 < 0:
        import jax
        if jax.default_backend() == "cpu":
            return 0
        s1 = 48 if S >= 64 else 0
    if s1 <= 1 or s1 >= S:
        return 0
    return s1


def _pad_states(res: EvbResult, batch: DiabatBatch, S: int):
    """Pad a small-tier (S1-capped) result up to the full cap S so both
    lax.cond branches return identical shapes.  Padded rows are inert:
    every consumer masks by `sidx < n_states` or gathers a row index
    < n_states (the integrator reads batch.topo[principle])."""
    S1 = res.eigenvector.shape[0]
    pad = S - S1
    sidx = jnp.arange(S)

    def pad0(a, fill):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)

    H = jnp.zeros((S, S), res.hamiltonian.dtype)
    H = H.at[:S1, :S1].set(res.hamiltonian)
    # park the padded diagonal like assemble_hamiltonian parks inactive
    # states (diagnostic only -- the eigensolver never sees this matrix)
    park = jax.lax.stop_gradient(res.hamiltonian[0, 0]) \
        + INACTIVE_DIAG * (1.0 + sidx[:, None] / S)
    H = jnp.where((sidx[:, None] == sidx[None, :]) & (sidx[:, None] >= S1),
                  park, H)

    res = res.replace(
        eigenvector=pad0(res.eigenvector, 0),
        hamiltonian=H,
        hydronium_of=pad0(res.hydronium_of, -1),
        n_hops_of=pad0(res.n_hops_of, 0))

    dset = batch.dset
    dset = dset.replace(
        hop_log=pad0(dset.hop_log, -1),
        n_hops=pad0(dset.n_hops, 0),
        parent=pad0(dset.parent, -1),
        hydronium_of=pad0(dset.hydronium_of, -1))
    # padded topology rows repeat state 0 (a valid topology) so any
    # accidental consumer sees self-consistent data rather than zeros
    topo_b = jax.tree_util.tree_map(
        lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0),
        batch.topo)
    batch = DiabatBatch(dset=dset, topo=topo_b,
                        changed_atoms=pad0(batch.changed_atoms, -1),
                        changed_mask=pad0(batch.changed_mask, False))
    return res, batch


def adiabatic_energy_force(x, box, topo: Topology, system: System,
                           pairs, cbw, full_idx=None,
                           react_idx=None, com=None) -> tuple:
    """Full MS-EVB force/energy evaluation; returns (EvbResult, DiabatBatch).

    react_idx: optional short-cutoff adjacency (nlist.react_idx) -- the
    narrowest rows that still cover evb_reactive_pair_distance; used for
    the hop-candidate search only.
    com: optional precomputed per-molecule COM of (x, topo); every use is
    under stop_gradient (candidate cutoffs, PBC shift conventions).

    Two-tier evaluation (small_state_tier): the padded state batch is the
    engine's whole S-scaling cost (every per-state stage pays the cap, not
    the live n_states; measured 38 us device/step per padded state on the
    flagship box), yet the equilibrated liquid needs the reference's
    production cap of 80 (glob_v.f90:60) only for ~1%-tail excursions.  So
    the pipeline runs at a small cap S1 and escalates to the full cap
    inside jax.lax.cond only when the S1 enumeration overflows -- one
    compiled program, per-step granularity, exact physics (the small-tier
    state set is bit-identical to the full enumeration whenever it fits,
    and TPU conditionals execute only the taken branch)."""
    if full_idx is None:
        # derive a full adjacency from the half pair list is not possible
        # here; callers on the hot path pass nlist.full_idx.  Fallback:
        # dense all-pairs rows (testing convenience only).
        N = system.n_atoms
        full_idx = jnp.where(
            jnp.eye(N, dtype=bool), -1,
            jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (N, N)))
    from .enumerate import molecule_com
    if com is None:
        com = molecule_com(x, topo, system.mass, box)
    com = jax.lax.stop_gradient(com)
    enum_src = react_idx if react_idx is not None else full_idx

    S1 = small_state_tier(system)
    if not S1:
        dset = enumerate_diabats(x, box, topo, system, full_idx=enum_src,
                                 com=com)
        return _eval_at_cap(x, box, topo, system, pairs, cbw, full_idx,
                            com, dset)

    S = system.evb_max_states
    sys_small = system.replace(evb_max_states=S1)
    dset_small = enumerate_diabats(x, box, topo, sys_small,
                                   full_idx=enum_src, com=com)

    def small_branch(xx):
        res, batch = _eval_at_cap(xx, box, topo, sys_small, pairs, cbw,
                                  full_idx, com, dset_small)
        return _pad_states(res, batch, S)

    def big_branch(xx):
        dset_big = enumerate_diabats(xx, box, topo, system,
                                     full_idx=enum_src, com=com)
        return _eval_at_cap(xx, box, topo, system, pairs, cbw, full_idx,
                            com, dset_big)

    return jax.lax.cond(dset_small.overflow, big_branch, small_branch, x)
