"""Intra-molecular bonded terms: bonds, angles, dihedrals.

Function types and formulas match intra_bonded_interactions.f90:

  bonds (125-168)      1 harmonic  E = k/2 (r-b0)^2
                       2 GROMOS-96 E = k/4 (r^2-b0^2)^2
                       3 Morse     E = D (1-e^{-beta(r-b0)})^2
  angles (219-284)     1 harmonic in theta, 2 cosine-based
  dihedrals (343-552)  1 proper k(1+cos(n xi - xi0)),
                       2 improper harmonic with pi/2 folding,
                       3 Ryckaert-Bellemans (odd cosine terms negated)

Evaluated as a flat gather-compute over (molecule x template-slot) tensors
(vmapped across diabats by the EVB layer); forces via autodiff, with acos
clamped exactly like the reference's numerical guards (:240-247, :404-411).
All bonded displacements are minimum-imaged: in a diabat topology the
transferred proton can sit across the periodic boundary from its new
molecule (the reference instead physically re-wraps per-diabat copies via
make_molecule_whole, ms_evb.f90:876).
"""

import jax
import jax.numpy as jnp

from ..topology import System, Topology
from ..utils import pbc


def _term_sum(e, idx_table, per_mol):
    """Total or per-molecule (M,) sum of flat (M*S,) term energies."""
    if per_mol:
        S = idx_table.shape[1]
        return jnp.sum(e.reshape(-1, S), axis=1)
    return jnp.sum(e)


def _safe_acos(c):
    # epsilon must survive the dtype: 1 - 1e-9 rounds to 1.0 in fp32, which
    # puts clipped values exactly at the acos singularity (infinite grad)
    eps = 1e-6 if c.dtype == jnp.float32 else 1e-9
    return jnp.arccos(jnp.clip(c, -1.0 + eps, 1.0 - eps))


def _mol_sites(x, topo, mols=None):
    """(M, A, 3) positions of every molecule's template slots: ONE row
    gather for ALL bonded terms (padded slots clamp to slot 0; callers
    mask).  Its transpose is likewise ONE scatter-add for the combined
    bond/angle/dihedral force back-map instead of one per term side."""
    ma = topo.mol_atoms if mols is None \
        else topo.mol_atoms[jnp.maximum(mols, 0)]
    g = jnp.maximum(ma, 0).reshape(-1)
    return x[g].reshape(ma.shape[0], ma.shape[1], x.shape[1])


def _gather_pairs(xa, topo, system, idx_table, par_table, mols=None,
                  mmask=None):
    """Resolve template index tables to per-term SITE POSITIONS + compiled
    per-term parameters.

    xa: (M, A, 3) molecule-site positions from _mol_sites.
    idx_table: (MT, S, arity) local slot indices, -1 padded.
    par_table: (MT, S, C) packed [func, params...] floats compiled per
    template (topology.py).
    mols/mmask: optional molecule subset (the EVB delta diagonals evaluate
    bonded terms only for hop-chain molecules).
    Returns (pos (M*S, arity, 3), func (M*S,), params (M*S, C-1),
    mask (M*S,)).

    TPU layout: both per-type tables ride ONE one-hot (M, MT) matmul
    (exact 0/1 selection, ops/lookup.py rationale) and the slot->site
    resolution is an exact one-hot einsum over the tiny A axis -- no
    dynamic per-element gathers, and the position pull-out backs into the
    shared _mol_sites row gather instead of per-term x[g] gathers (the
    take_along_axis + 9 per-term-side gathers were ~1.4 ms/step at 10^4
    atoms)."""
    from ..ops.lookup import one_hot_f
    if mols is None:
        mt_of_mol = topo.mol_mtype                    # (M,)
        sub_mask = None
    else:
        mt_of_mol = topo.mol_mtype[jnp.maximum(mols, 0)]
        sub_mask = mmask
    MT, S, ar = idx_table.shape
    C = par_table.shape[-1]
    f = xa.dtype
    hi = jax.lax.Precision.HIGHEST
    oh_t = one_hot_f(mt_of_mol, MT, f)                # (M, MT)
    both = jnp.concatenate(
        [idx_table.reshape(MT, S * ar).astype(f),
         par_table.reshape(MT, S * C).astype(f)], axis=1)
    sel = jnp.matmul(oh_t, both, precision=hi)        # (M, S*(ar+C))
    table = jnp.round(sel[:, :S * ar]).astype(jnp.int32).reshape(-1, S, ar)
    par = sel[:, S * ar:].reshape(-1, S, C)
    mask = table[..., 0] >= 0                         # (M, S)
    if sub_mask is not None:
        mask = mask & sub_mask[:, None]
    safe = jnp.maximum(table, 0)                      # (M, S, ar)
    A = xa.shape[1]
    oh_s = one_hot_f(safe, A, f)                      # (M, S, ar, A)
    M = safe.shape[0]
    pos = jnp.matmul(oh_s.reshape(M, S * ar, A), xa,
                     precision=hi).reshape(M * S, ar, 3)
    func = jnp.round(par[..., 0]).astype(jnp.int32).reshape(M * S)
    return pos, func, par[..., 1:].reshape(M * S, -1), mask.reshape(M * S)


def bond_energy(x, box, topo: Topology, system: System, mols=None,
                mmask=None, xa=None, per_mol=False):
    if xa is None:
        xa = _mol_sites(x, topo, mols)
    pos, func, p, mask = _gather_pairs(xa, topo, system, system.mt.bonds,
                                       system.mt.bond_tab, mols, mmask)

    dr = pbc.min_image(pos[:, 0] - pos[:, 1], box)
    r2 = jnp.sum(dr * dr, axis=-1)
    r2 = jnp.where(mask, r2, 1.0)
    r = jnp.sqrt(r2)

    e_harm = 0.5 * p[:, 1] * (r - p[:, 0]) ** 2
    e_g96 = 0.25 * p[:, 1] * (r2 - p[:, 0] ** 2) ** 2
    morse_exp = jnp.exp(-p[:, 1] * (r - p[:, 2]))
    e_morse = p[:, 0] * (1.0 - morse_exp) ** 2
    e = jnp.where(func == 1, e_harm,
                  jnp.where(func == 2, e_g96,
                            jnp.where(func == 3, e_morse, 0.0)))
    return _term_sum(jnp.where(mask, e, 0.0), system.mt.bonds, per_mol)


def angle_energy(x, box, topo: Topology, system: System, mols=None,
                 mmask=None, xa=None, per_mol=False):
    if xa is None:
        xa = _mol_sites(x, topo, mols)
    pos, func, p, mask = _gather_pairs(xa, topo, system, system.mt.angles,
                                       system.mt.angle_tab, mols, mmask)

    r_ij = pbc.min_image(pos[:, 0] - pos[:, 1], box)
    r_kj = pbc.min_image(pos[:, 2] - pos[:, 1], box)
    nij2 = jnp.where(mask, jnp.sum(r_ij * r_ij, -1), 1.0)
    nkj2 = jnp.where(mask, jnp.sum(r_kj * r_kj, -1), 1.0)
    cos_t = jnp.where(mask, jnp.sum(r_ij * r_kj, -1), 0.0) \
        / jnp.sqrt(nij2 * nkj2)

    theta = _safe_acos(cos_t)
    e_harm = 0.5 * p[:, 1] * (theta - p[:, 0]) ** 2
    e_cos = 0.5 * p[:, 1] * (cos_t - jnp.cos(p[:, 0])) ** 2
    e = jnp.where(func == 1, e_harm, jnp.where(func == 2, e_cos, 0.0))
    return _term_sum(jnp.where(mask, e, 0.0), system.mt.angles, per_mol)


def dihedral_energy(x, box, topo: Topology, system: System, mols=None,
                    mmask=None, xa=None, per_mol=False):
    if xa is None:
        xa = _mol_sites(x, topo, mols)
    pos, func, p, mask = _gather_pairs(xa, topo, system,
                                       system.mt.dihedrals,
                                       system.mt.dihedral_tab, mols, mmask)

    r_ji = pbc.min_image(pos[:, 1] - pos[:, 0], box)
    r_kj = pbc.min_image(pos[:, 2] - pos[:, 1], box)
    r_lk = pbc.min_image(pos[:, 3] - pos[:, 2], box)

    # triple-product form used by the reference (intra_bonded:361-402):
    # alpha = r_ji x r_kj, beta = r_kj x r_lk, cos xi = a.b/|a||b|
    d_kj_ji = jnp.sum(r_kj * r_ji, -1)
    d_lk_kj = jnp.sum(r_lk * r_kj, -1)
    d_lk_ji = jnp.sum(r_lk * r_ji, -1)
    nji2 = jnp.sum(r_ji * r_ji, -1)
    nkj2 = jnp.sum(r_kj * r_kj, -1)
    nlk2 = jnp.sum(r_lk * r_lk, -1)

    a_dot_b = jnp.where(mask, d_kj_ji * d_lk_kj - d_lk_ji * nkj2, 0.0)
    a_dot_a = jnp.where(mask, nji2 * nkj2 - d_kj_ji ** 2, 1.0)
    b_dot_b = jnp.where(mask, nlk2 * nkj2 - d_lk_kj ** 2, 1.0)
    a_dot_a = jnp.maximum(a_dot_a, 1e-12)
    b_dot_b = jnp.maximum(b_dot_b, 1e-12)
    cos_xi = a_dot_b / jnp.sqrt(a_dot_a * b_dot_b)
    xi = _safe_acos(cos_xi)

    # proper
    e_proper = p[:, 1] * (1.0 + jnp.cos(p[:, 2] * xi - p[:, 0]))
    # improper: fold to [0, pi/2] (intra_bonded:469-474)
    xi_fold = jnp.where(xi > jnp.pi / 2.0, jnp.abs(xi - jnp.pi), xi)
    e_improper = 0.5 * p[:, 1] * (xi_fold - p[:, 0]) ** 2
    # Ryckaert-Bellemans with negated odd powers (intra_bonded:529-530)
    c = cos_xi
    e_rb = (p[:, 0] - p[:, 1] * c + p[:, 2] * c ** 2 - p[:, 3] * c ** 3
            + p[:, 4] * c ** 4 - p[:, 5] * c ** 5)

    e = jnp.where(func == 1, e_proper,
                  jnp.where(func == 2, e_improper,
                            jnp.where(func == 3, e_rb, 0.0)))
    return _term_sum(jnp.where(mask, e, 0.0), system.mt.dihedrals, per_mol)


def bonded_energies(x, box, topo: Topology, system: System, mols=None,
                    mmask=None, xa=None, per_mol=False):
    if xa is None:
        xa = _mol_sites(x, topo, mols)   # shared across all three terms
    return (bond_energy(x, box, topo, system, mols, mmask, xa=xa,
                        per_mol=per_mol),
            angle_energy(x, box, topo, system, mols, mmask, xa=xa,
                         per_mol=per_mol),
            dihedral_energy(x, box, topo, system, mols, mmask, xa=xa,
                            per_mol=per_mol))
