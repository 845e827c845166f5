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


def reference_energy(topo: Topology, system: System):
    """Chemical reference energy of the topology's acid state
    (get_adiabatic_reference_energy, ms_evb.f90:2849-2855)."""
    mtype = topo.mol_mtype[topo.hydronium_mol]
    return system.mt.reference_energy[mtype]
