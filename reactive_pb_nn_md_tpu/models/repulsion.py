"""MS-EVB special repulsive interactions (diagonal Hamiltonian terms).

Equations 7-9 of JPC B 2008, 112, 467 (with the erratum's q-coordinate in
the O-O term), as implemented in ms_evb.f90:2259-2504:

  three-atom term : sum over solvent heavy atoms J with a (J, heavy, H)
                    entry: S(r_OO) B e^{-b(r_OO-d0)} sum_H e^{-b' q^2},
                    q = (r_J + r_O)/2 - r_H
  Born-Mayer      : sum over (J, hydronium-atom) pairs with a (J, type_i)
                    entry: S(r) C e^{-c(r-d0)}
  switch S        : cubic switch between rs and rc (ms_evb.f90:2484-2504)

Computed as dense masked sums over all atoms -- O(N) with tiny constants,
vmapped over diabats.  Forces come from autodiff.
"""

import jax
import jax.numpy as jnp

from ..topology import System, Topology
from ..utils import pbc
from ..ops.lookup import one_hot_f


def _switch(r, rs, rc):
    """Cubic switching function, 1 below rs, 0 above rc."""
    denom3 = jnp.maximum((rc - rs) ** 3, 1e-12)
    term1 = (r - rs) ** 2 / denom3
    term2 = 3.0 * rc - rs - 2.0 * r
    mid = 1.0 - term1 * term2
    return jnp.where(r >= rc, 0.0, jnp.where(r < rs, 1.0, mid))


def _hydronium_slots(topo: Topology, system: System):
    """Slot masks/indices for the hydronium molecule of this topology."""
    h = topo.hydronium_mol
    mtype = topo.mol_mtype[h]
    atoms = topo.mol_atoms[h]                     # (A,)
    amask = atoms >= 0
    atoms_safe = jnp.maximum(atoms, 0)
    types = jnp.where(amask, topo.atom_type[atoms_safe], -1)
    heavy_t = system.mt.heavy_atype[mtype]
    proton_t = system.mt.proton_atype[mtype]
    # first slot whose type is the acid heavy type (get_heavy_atom_transfer_acid)
    is_heavy = types == heavy_t
    heavy_slot = jnp.argmax(is_heavy)
    heavy_atom = atoms_safe[heavy_slot]
    return atoms_safe, amask, types, heavy_atom, proton_t


def ms_evb_repulsion(x, box, topo: Topology, system: System):
    """Total special repulsion energy for this topology's hydronium."""
    evb = system.evb
    atoms, amask, types, heavy_atom, proton_t = _hydronium_slots(topo, system)
    h_mol = topo.hydronium_mol

    N = x.shape[0]
    solvent = topo.atom_mol != h_mol             # (N,)
    t_j = topo.atom_type                          # (N,)

    # ----- three-atom O-O repulsion (ms_evb.f90:2295-2399)
    t_heavy = topo.atom_type[heavy_atom]
    # per-solvent-atom parameters, keyed (j_type, heavy_type, H_type).
    # (heavy_type, H_type) are per-topology scalars, so slice the (T,...)
    # column and contract with a one-hot of t_j on the MXU -- the direct
    # (N,)-gather from the tiny table serialized at ~200 ns/element and was
    # ~15% of the reactive step under the diabat vmap (see ops/lookup.py)
    T = evb.da_params.shape[0]
    hp_col = jnp.maximum(t_heavy, 0), jnp.maximum(proton_t, 0)
    oh_j = one_hot_f(t_j, T, x.dtype)                           # (N, T)
    da_p = oh_j @ evb.da_params[:, hp_col[0], hp_col[1], :]     # (N, 6)
    da_m = (oh_j @ evb.da_mask[:, hp_col[0], hp_col[1]]
            .astype(x.dtype) > 0.5) & solvent

    # one-hot row matmul: the scalar gather's force transpose serialized
    # into a row-at-a-time scatter while loop (ops/lookup.py rows_onehot)
    from ..ops.lookup import rows_onehot
    r_heavy = rows_onehot(x, heavy_atom[None])[0]
    d_jO = pbc.min_image(r_heavy[None, :] - x, box)     # j -> heavy, (N, 3)
    r_OO = jnp.sqrt(jnp.where(da_m, jnp.sum(d_jO * d_jO, -1), 1.0))
    B, bl, d0, blp, rs, rc = (da_p[:, k] for k in range(6))
    s_OO = _switch(r_OO, rs, rc)
    fac_OO = B * jnp.exp(-bl * (r_OO - d0))

    # sum over hydronium protons of exp(-b' q^2), q = (r_j + r_O)/2 - r_H,
    # with the proton min-imaged using the heavy-atom pair shift
    shift_jO = jax.lax.stop_gradient((r_heavy[None, :] - x) - d_jO)  # (N,3)
    is_proton = (types == proton_t) & amask                           # (A,)
    # protons min-imaged against the heavy atom: the hydronium can be split
    # across the boundary in a diabat topology
    r_H = r_heavy[None, :] + pbc.min_image(x[atoms] - r_heavy[None, :],
                                           box)                       # (A, 3)
    # proton position in the j-local frame: r_H - shift (same lattice shift
    # as the heavy atom, cf. ms_evb.f90:2363)
    d_jH = (r_H[None, :, :] - shift_jO[:, None, :]) - x[:, None, :]   # (N,A,3)
    q = (x[:, None, :] + (x[:, None, :] + d_jO[:, None, :])) / 2.0 \
        - (x[:, None, :] + d_jH)                                      # (N,A,3)
    q2 = jnp.sum(q * q, axis=-1)
    exp_q = jnp.where(is_proton[None, :], jnp.exp(-blp[:, None] * q2), 0.0)
    sum_q = jnp.sum(exp_q, axis=-1)                                   # (N,)

    e_three = jnp.sum(jnp.where(da_m, s_OO * fac_OO * sum_q, 0.0))

    # ----- Born-Mayer proton-acceptor terms (ms_evb.f90:2405-2478)
    # (N, A) lookups keyed (j_type, i_type): contract the A side into a
    # tiny (T, A, 5) table first, then one (N, T) @ (T, A*5) MXU matmul
    t_i = jnp.where(amask, types, 0)                                  # (A,)
    A_ = t_i.shape[0]
    oh_i = one_hot_f(t_i, T, x.dtype)                                 # (A, T)
    pa_sel = jnp.einsum("au,tuk->tak", oh_i,
                        evb.pa_params.astype(x.dtype))                # (T,A,5)
    pa_p = (oh_j @ pa_sel.reshape(T, A_ * 5)).reshape(-1, A_, 5)      # (N,A,5)
    pm_sel = jnp.einsum("au,tu->ta", oh_i, evb.pa_mask.astype(x.dtype))
    pa_m = ((oh_j @ pm_sel) > 0.5) \
        & solvent[:, None] & amask[None, :]
    d_ji = pbc.min_image(x[atoms][None, :, :] - x[:, None, :], box)   # (N,A,3)
    r_ji = jnp.sqrt(jnp.where(pa_m, jnp.sum(d_ji * d_ji, -1), 1.0))
    C, cl, d0h, rsh, rch = (pa_p[..., k] for k in range(5))
    e_bm = _switch(r_ji, rsh, rch) * C * jnp.exp(-cl * (r_ji - d0h))
    e_born_mayer = jnp.sum(jnp.where(pa_m, e_bm, 0.0))

    return e_three + e_born_mayer


_DOMAIN_IMPL = "auto"       # "auto" (cell-table path only) | "on" | "off"


def set_domain_impl(impl):
    """Select the repulsion sweep: candidate rows or the dense O(N) scan
    ("auto", "on", "off") -- testing override."""
    global _DOMAIN_IMPL
    assert impl in ("auto", "on", "off"), impl
    _DOMAIN_IMPL = impl


def domain_repulsion_active(system: System, on_demand: bool):
    """The candidate-row sweep is exact iff every repulsion switch outer
    radius fits inside the neighbor-row coverage (= real_space_cutoff)."""
    if not (0.0 < system.evb_rep_rc_max <= system.real_space_cutoff):
        return False
    if _DOMAIN_IMPL != "auto":
        return _DOMAIN_IMPL == "on"
    return on_demand


def ms_evb_repulsion_batched_domain(box, batch, system: System, xu,
                                    pos_in_U, rmask, pj, tU, ohJ):
    """(S,) per-state EVB repulsion from the field-decomposition rows.

    Replaces the dense O(N)-per-state sweep of ms_evb_repulsion (at 10^4
    atoms / 32 states the (S, N, A) tensors were ~0.4 ms/step) when every
    switch radius fits the row coverage (domain_repulsion_active): the
    three-atom O-O term only reaches rc(t_j) from the hydronium heavy
    atom (its own candidate row), and each Born-Mayer (J, i) term only
    reaches rc(t_j, t_i) from acid atom i (that atom's own row).  Every
    acid atom of every diabat is in the changed-molecule superset U (a
    diabat's hydronium is a chain molecule; the principle hydronium is
    force-included in U), so the rows exist.  In-U candidates get
    per-state types / acid-membership via one-hot matmuls; out-of-U
    candidates are state-independent.  Same physics as ms_evb_repulsion
    (ms_evb.f90:2259-2504); equality is asserted by
    tests/test_delta_diag.py.

    xu: (U, 3) positions of the superset atoms (differentiable);
    pj: (U, Kf, 7) packed candidate rows [x, q0, t0, mol0, posU];
    tU: (S, U) per-state atom types on U; ohJ: (U*Kf, U) candidate
    in-U one-hot (rows with posU < 0 spuriously one-hot slot 0 --
    masked here like in the caller)."""
    evb = system.evb
    f = xu.dtype
    U = xu.shape[0]
    Kf = pj.shape[1]
    T = evb.da_params.shape[0]
    A_ = batch.topo.mol_atoms.shape[-1]
    hi = jax.lax.Precision.HIGH
    ohJr = ohJ.reshape(U, Kf, U)

    def one(topo_d, tU_s):
        h = topo_d.hydronium_mol
        mtype = topo_d.mol_mtype[h]
        atoms = topo_d.mol_atoms[h]                       # (A,)
        amask = atoms >= 0
        a_safe = jnp.maximum(atoms, 0)
        types = jnp.where(amask, topo_d.atom_type[a_safe], -1)
        heavy_tr = system.mt.heavy_atype[mtype]
        proton_tr = system.mt.proton_atype[mtype]
        heavy_t = jnp.maximum(heavy_tr, 0)
        proton_t = jnp.maximum(proton_tr, 0)

        slotU = jnp.where(amask, pos_in_U[a_safe], -1)
        row_ok = amask & (slotU >= 0)
        ohA = jnp.where(row_ok[:, None],
                        one_hot_f(jnp.maximum(slotU, 0), U, f),
                        0.0)                              # (A, U)

        xa = jnp.matmul(ohA, xu, precision=hi)            # (A, 3)
        pjA = jnp.einsum("au,ukc->akc", ohA, pj, precision=hi)  # (A,Kf,7)
        maskA = jnp.einsum("au,uk->ak", ohA, rmask.astype(f),
                           precision=hi) > 0.5
        ohJ_A = jnp.einsum("au,ukv->akv", ohA, ohJr,
                           precision=hi)                  # (A, Kf, U)
        acidU = jnp.sum(ohA, axis=0)                      # (U,)
        jU_A = jnp.round(pjA[..., 6]).astype(jnp.int32)
        inU_j = jU_A >= 0
        in_acid = (jnp.einsum("akv,v->ak", ohJ_A, acidU,
                              precision=hi) > 0.5) & inU_j
        tJ_in = jnp.einsum("akv,v->ak", ohJ_A, tU_s.astype(f),
                           precision=hi)
        t_j = jnp.where(inU_j, jnp.round(tJ_in).astype(jnp.int32),
                        jnp.round(pjA[..., 4]).astype(jnp.int32))
        solvent = maskA & ~in_acid
        xj = pjA[..., 0:3]

        # ----- three-atom O-O repulsion on the heavy atom's row
        ohH = one_hot_f(jnp.argmax(types == heavy_tr), A_, f)   # (A,)
        xH = jnp.einsum("a,ac->c", ohH, xa, precision=hi)
        xjH = jnp.einsum("a,akc->kc", ohH, xj, precision=hi)
        tjH = jnp.round(jnp.einsum("a,ak->k", ohH, t_j.astype(f),
                                   precision=hi)).astype(jnp.int32)
        mH = jnp.einsum("a,ak->k", ohH, solvent.astype(f),
                        precision=hi) > 0.5
        d_jO = pbc.min_image(xH[None, :] - xjH, box)      # (Kf, 3)
        oh_tj = one_hot_f(tjH, T, f)                      # (Kf, T)
        da_p = jnp.matmul(oh_tj, evb.da_params[:, heavy_t, proton_t, :]
                          .astype(f), precision=hi)       # (Kf, 6)
        da_m = (jnp.matmul(oh_tj, evb.da_mask[:, heavy_t, proton_t]
                           .astype(f), precision=hi) > 0.5) & mH
        r_OO = jnp.sqrt(jnp.where(da_m, jnp.sum(d_jO * d_jO, -1), 1.0))
        B, bl, d0, blp, rs, rc = (da_p[:, k] for k in range(6))
        s_OO = _switch(r_OO, rs, rc)
        fac_OO = B * jnp.exp(-bl * (r_OO - d0))
        shift_jO = jax.lax.stop_gradient((xH[None, :] - xjH) - d_jO)
        is_proton = (types == proton_tr) & amask
        r_H = xH[None, :] + pbc.min_image(xa - xH[None, :], box)  # (A, 3)
        d_jH = (r_H[None, :, :] - shift_jO[:, None, :]) \
            - xjH[:, None, :]                             # (Kf, A, 3)
        q = d_jO[:, None, :] / 2.0 - d_jH
        q2 = jnp.sum(q * q, axis=-1)
        exp_q = jnp.where(is_proton[None, :],
                          jnp.exp(-blp[:, None] * q2), 0.0)
        e_three = jnp.sum(jnp.where(da_m, s_OO * fac_OO
                                    * jnp.sum(exp_q, axis=-1), 0.0))

        # ----- Born-Mayer terms, each anchored at its own atom's row
        t_i = jnp.where(amask, types, 0)
        oh_i = one_hot_f(t_i, T, f)                       # (A, T)
        pa_sel = jnp.einsum("ai,tic->atc", oh_i, evb.pa_params.astype(f),
                            precision=hi)                 # (A, T, 5)
        oh_tjA = one_hot_f(t_j, T, f)                     # (A, Kf, T)
        pa_p = jnp.einsum("akt,atc->akc", oh_tjA, pa_sel, precision=hi)
        pm_sel = jnp.einsum("ai,ti->at", oh_i, evb.pa_mask.astype(f),
                            precision=hi)
        pa_m = (jnp.einsum("akt,at->ak", oh_tjA, pm_sel,
                           precision=hi) > 0.5) \
            & solvent & amask[:, None]
        d_ji = pbc.min_image(xa[:, None, :] - xj, box)    # (A, Kf, 3)
        r_ji = jnp.sqrt(jnp.where(pa_m, jnp.sum(d_ji * d_ji, -1), 1.0))
        C, cl, d0h, rsh, rch = (pa_p[..., k] for k in range(5))
        e_bm = _switch(r_ji, rsh, rch) * C * jnp.exp(-cl * (r_ji - d0h))
        return e_three + jnp.sum(jnp.where(pa_m, e_bm, 0.0))

    return jax.vmap(one)(batch.topo, tU)


def reference_energy(topo: Topology, system: System):
    """Chemical reference energy of the topology's acid state
    (get_adiabatic_reference_energy, ms_evb.f90:2849-2855)."""
    mtype = topo.mol_mtype[topo.hydronium_mol]
    return system.mt.reference_energy[mtype]
