"""Total energy aggregation (non-reactive path).

Maps calculate_total_force_energy (total_energy_forces.f90:19-99) to a pure
function of positions.  Components:

  inter-molecular real space : Ewald erfc + LJ/SAPT over the neighbor list
                               (pairwise_real_space_verlet)
  intra-molecular nonbonded  : exclusion-coded template pairs, erfc with
                               cutoff, vdW without cutoff, -erf corrections
                               (intra_molecular_pairwise_energy_force)
  PME reciprocal + Ewald self
  bonds / angles / dihedrals

Forces = -jax.grad(total).  The same functions are vmapped over the diabat
axis by the EVB layer: topology enters only through index/charge arrays.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..topology import System, Topology
from ..utils import pbc
from ..utils.constants import CONV_E2A_KJMOL
from . import nonbonded, bonded, pme
from ..ops.lookup import pair_lookup


@struct.dataclass
class EnergyBreakdown:
    total: jnp.ndarray
    elec: jnp.ndarray
    vdw: jnp.ndarray
    bond: jnp.ndarray
    angle: jnp.ndarray
    dihedral: jnp.ndarray


def _use_rs_kernel(system, dtype):
    from ..ops.pallas.realspace_pair import _on_tpu
    return bool(system.rs_cells) and dtype == jnp.float32 and _on_tpu()


def realspace_inter(x, box, topo: Topology, system: System, pairs):
    """Inter-molecular real-space energy over the padded half pair list.

    On TPU fp32 with a valid cell grid (system.rs_cells) this dispatches
    to the fused Pallas cell-pair kernel (ops/pallas/realspace_pair.py):
    energies and analytic forces in one scatter-free pass.  Otherwise the
    XLA half-list path below runs (CPU, fp64, tiny/triclinic boxes, and
    the vmapped ground-truth diabat path).

    pairs: (i, j, mask) broadcastable index arrays ((N,1)/(N,K) from
    neighbor_pairs, or flat).  Same-molecule pairs are masked here (the
    diabat's own molecule assignment decides inter vs intra).

    The x-independent j-side per-atom values (charge, type, molecule)
    ride in the same packed array as the positions so the pair sweep
    issues ONE j-gather -- TPU gather cost is per-row, not per-byte."""
    if _use_rs_kernel(system, x.dtype) and x.ndim == 2:
        from ..ops.pallas.realspace_pair import (realspace_inter_cells,
                                                 _build_tabs)
        f = x.dtype
        tabs = _build_tabs(system, f)
        consts = (float(system.real_space_cutoff),
                  float(system.alpha_sqrt), bool(system.has_sapt),
                  int(system.ff.vdw_type.shape[0]))
        return realspace_inter_cells(
            x, topo.charge.astype(f), topo.atom_type.astype(f),
            topo.atom_mol.astype(f), box, tabs, system.rs_cells, consts)
    return _realspace_inter_xla(x, box, topo, system, pairs)


def _realspace_inter_xla(x, box, topo: Topology, system: System, pairs):
    """The XLA half-list pair sweep (see realspace_inter)."""
    i, j, mask = pairs
    if j.shape[-1] == 0 and system.n_atoms > 1:
        raise ValueError(
            "half neighbor list was skipped at build time (build_half="
            "False, fused-kernel path) but the XLA pair sweep needs it -- "
            "rebuild the neighbor list with build_half=True")
    f = x.dtype
    # positions AND values in one (N, 6) array -> ONE j-row gather for the
    # whole pair sweep (previously two: packed values + x[j]); its backward
    # is likewise a single scatter-add
    packed = jnp.concatenate(
        [x, jnp.stack([topo.charge.astype(f),
                       topo.atom_type.astype(f),
                       topo.atom_mol.astype(f)], axis=1)], axis=1)  # (N, 6)
    pj = packed[j]                                          # one gather
    pi = packed[i]
    inter = mask & (pi[..., 5] != pj[..., 5])

    dr = pi[..., 0:3] - pj[..., 0:3]
    dr = pbc.min_image(dr, box)
    r2 = jnp.sum(dr * dr, axis=-1)
    within = inter & (r2 < system.real_space_cutoff ** 2)
    r2s = jnp.where(within, r2, 1.0)
    r = jnp.sqrt(r2s)

    qq = pi[..., 3] * pj[..., 3]
    e_elec = nonbonded.ewald_real(qq, r, system.alpha_sqrt)

    ti = jnp.round(pi[..., 4]).astype(jnp.int32)
    tj = jnp.round(pj[..., 4]).astype(jnp.int32)
    vtype = pair_lookup(system.ff.vdw_type, ti, tj)
    params = pair_lookup(system.ff.vdw_params, ti, tj)
    e_vdw = nonbonded.vdw_pair_energy(
        vtype, params, params, jnp.zeros_like(within), r, r2s,
        has_sapt=system.has_sapt)

    zero = jnp.zeros_like(e_elec)
    return (jnp.sum(jnp.where(within, e_elec, zero)),
            jnp.sum(jnp.where(within, e_vdw, zero)))


def realspace_pairs(x, box, topo: Topology, system: System, gi, gj, pmask,
                    weight):
    """Real-space inter-molecular energy of an explicit flat pair set.

    Used by the EVB delta diagonals: the pairs touching changed atoms,
    with weight 1/2 when both endpoints are changed (each such pair is
    enumerated from both rows of the full adjacency)."""
    inter = pmask & (topo.atom_mol[gi] != topo.atom_mol[gj])
    dr = pbc.min_image(x[gi] - x[gj], box)
    r2 = jnp.sum(dr * dr, axis=-1)
    within = inter & (r2 < system.real_space_cutoff ** 2)
    r2s = jnp.where(within, r2, 1.0)
    r = jnp.sqrt(r2s)

    qq = topo.charge[gi] * topo.charge[gj]
    e_elec = nonbonded.ewald_real(qq, r, system.alpha_sqrt)
    ti, tj = topo.atom_type[gi], topo.atom_type[gj]
    vtype = pair_lookup(system.ff.vdw_type, ti, tj)
    params = pair_lookup(system.ff.vdw_params, ti, tj)
    e_vdw = nonbonded.vdw_pair_energy(
        vtype, params, params, jnp.zeros_like(within), r, r2s,
        has_sapt=system.has_sapt)
    w = jnp.where(within, weight, 0.0)
    return jnp.sum(w * e_elec), jnp.sum(w * e_vdw)


def mol_sites_packed(x, topo: Topology):
    """(M, A, 4) [position | charge] of every molecule's template slots:
    ONE row gather (and ONE backward scatter) shared by the intra pair
    sweep and all three bonded terms."""
    f = x.dtype
    pc = jnp.concatenate([x, topo.charge.astype(f)[:, None]], axis=1)
    g = jnp.maximum(topo.mol_atoms, 0).reshape(-1)
    return pc[g].reshape(topo.mol_atoms.shape[0],
                         topo.mol_atoms.shape[1], 4)


def intra_nonbonded(x, box, topo: Topology, system: System, mols=None,
                    mmask=None, xa_pc=None, per_mol=False):
    """Intra-molecular nonbonded over per-type template pairs.

    Exclusion codes (intra_bonded_interactions.f90:574-617): 1 = excluded
    (gets only the -erf reciprocal correction), 2 = 1-4 (special C12/C6),
    0 = normal.  vdW has no cutoff, electrostatics does
    (pair_int_real_space.f90:386-588).  mols/mmask restricts to a molecule
    subset (EVB delta diagonals).  per_mol=True returns per-molecule (M,)
    partial sums instead of scalars (the chain-mol dedup computes the
    principle-topology side ONCE per superset molecule)."""
    A = system.max_atoms_per_mol
    # STATIC pair slots: iu/ju stay host numpy so every per-pair pull-out
    # below is a constant-index gather, not a per-element dynamic one
    iu, ju = np.triu_indices(A, 1)

    if mols is None:
        mt = topo.mol_mtype                               # (M,)
        mol_atoms = topo.mol_atoms
        sub = None
    else:
        safe_m = jnp.maximum(mols, 0)
        mt = topo.mol_mtype[safe_m]
        mol_atoms = topo.mol_atoms[safe_m]
        sub = mmask
    natom = system.mt.natom[mt]                           # (M,)
    valid = (ju[None, :] < natom[:, None])                # (M, S)
    if sub is not None:
        valid = valid & sub[:, None]
    # per-type static pair tables, selected by ONE one-hot (M, MT) matmul
    # (exact 0/1 selection, ops/lookup.py rationale): replaces the (M, P2)
    # 3-index excl_code gather + the (M, P2, 13) intra_tab row gather
    from ..ops.lookup import one_hot_f
    f = x.dtype
    hi = jnp.float64 if f == jnp.float64 else jnp.float32
    MT = system.mt.excl_code.shape[0]
    P2 = iu.shape[0]
    ec_pairs = system.mt.excl_code[:, iu, ju].astype(hi)  # (MT, P2) static
    it_pairs = system.mt.intra_tab.reshape(MT, P2 * 13).astype(hi)
    oh = one_hot_f(mt, MT, hi)                            # (M, MT)
    sel = jnp.matmul(oh, jnp.concatenate([ec_pairs, it_pairs], axis=1),
                     precision=jax.lax.Precision.HIGHEST)
    code = jnp.round(sel[:, :P2]).astype(jnp.int32).reshape(-1)
    itab = sel[:, P2:].reshape(-1, P2, 13).astype(f)
    valid = valid.reshape(-1)

    # ONE packed row gather of every molecule site (positions + charge);
    # the per-pair sides are then static column picks of it
    if xa_pc is None:
        pc = jnp.concatenate([x, topo.charge.astype(f)[:, None]], axis=1)
        g = jnp.maximum(mol_atoms, 0).reshape(-1)
        xa_pc = pc[g].reshape(mol_atoms.shape[0], A, 4)   # (M, A, 4)
    pci = xa_pc[:, iu].reshape(-1, 4)
    pcj = xa_pc[:, ju].reshape(-1, 4)

    # minimum image: a diabat's acceptor molecule can be split across the
    # periodic boundary (positions are shared across diabats)
    dr = pbc.min_image(pci[:, 0:3] - pcj[:, 0:3], box)
    r2 = jnp.sum(dr * dr, axis=-1)
    r2 = jnp.where(valid, r2, 1.0)
    r = jnp.sqrt(r2)
    qq = pci[:, 3] * pcj[:, 3]

    excluded = valid & (code == 1)
    nonexcl = valid & (code != 1)
    is_14 = code == 2

    e_corr = nonbonded.ewald_exclusion_correction(qq, r, system.alpha_sqrt)
    within = nonexcl & (r2 < system.real_space_cutoff ** 2)
    e_elec = nonbonded.ewald_real(qq, r, system.alpha_sqrt)

    vtype = jnp.round(itab[..., 0]).astype(jnp.int32).reshape(-1)
    params = itab[..., 1:7].reshape(-1, 6)
    params14 = itab[..., 7:13].reshape(-1, 6)
    e_vdw = nonbonded.vdw_pair_energy(vtype, params, params14, is_14, r, r2,
                                      has_sapt=system.has_sapt)

    zero = jnp.zeros_like(e_elec)
    el_terms = (jnp.where(excluded, e_corr, zero)
                + jnp.where(within, e_elec, zero))
    vdw_terms = jnp.where(nonexcl, e_vdw, zero)
    if per_mol:
        Mm = valid.shape[0] // P2
        return (jnp.sum(el_terms.reshape(Mm, P2), axis=1),
                jnp.sum(vdw_terms.reshape(Mm, P2), axis=1))
    return jnp.sum(el_terms), jnp.sum(vdw_terms)


def energy_no_recip(x, box, topo: Topology, system: System, pairs,
                    xa_pc=None):
    """All terms except reciprocal PME (which the EVB layer batches over
    diabats with delta-Q grids).  Includes Ewald self (charge-dependent).

    xa_pc: optional precomputed mol_sites_packed(x, topo) -- passing the
    SAME traced value the coupling layer uses makes autodiff accumulate
    both cotangents before the single backward scatter (two identical
    gathers CSE in XLA, but their transpose scatters have different
    operands and do not)."""
    e_real_elec, e_real_vdw = realspace_inter(x, box, topo, system, pairs)
    if xa_pc is None:
        xa_pc = mol_sites_packed(x, topo)
    e_intra_elec, e_intra_vdw = intra_nonbonded(x, box, topo, system,
                                                xa_pc=xa_pc)
    e_self = pme.ewald_self(topo.charge, system.alpha_sqrt)
    e_bond, e_angle, e_dihedral = bonded.bonded_energies(
        x, box, topo, system, xa=xa_pc[:, :, 0:3])
    return EnergyBreakdown(
        total=(e_real_elec + e_intra_elec + e_self + e_real_vdw
               + e_intra_vdw + e_bond + e_angle + e_dihedral),
        elec=e_real_elec + e_intra_elec + e_self,
        vdw=e_real_vdw + e_intra_vdw,
        bond=e_bond, angle=e_angle, dihedral=e_dihedral)


def total_energy(x, box, topo: Topology, system: System, pairs, cbw):
    """Full potential energy of one topology (= one diabat diagonal, minus
    the EVB repulsion/reference terms handled by the EVB layer)."""
    e_real_elec, e_real_vdw = realspace_inter(x, box, topo, system, pairs)
    xa_pc = mol_sites_packed(x, topo)
    e_intra_elec, e_intra_vdw = intra_nonbonded(x, box, topo, system,
                                                xa_pc=xa_pc)

    K = system.pme_grid
    Q = pme.charge_grid(x, topo.charge, box, K, system.spline_order,
                        scap=system.pme_scap)
    e_recip = pme.recip_energy(Q, cbw)
    e_self = pme.ewald_self(topo.charge, system.alpha_sqrt)

    e_bond, e_angle, e_dihedral = bonded.bonded_energies(
        x, box, topo, system, xa=xa_pc[:, :, 0:3])

    e_elec = e_real_elec + e_intra_elec + e_recip + e_self
    e_vdw = e_real_vdw + e_intra_vdw
    total = e_elec + e_vdw + e_bond + e_angle + e_dihedral
    return EnergyBreakdown(total=total, elec=e_elec, vdw=e_vdw,
                           bond=e_bond, angle=e_angle, dihedral=e_dihedral)


def total_energy_and_forces(x, box, topo, system, pairs, cbw):
    def etot(xx):
        bd = total_energy(xx, box, topo, system, pairs, cbw)
        return bd.total, bd

    (_, bd), g = jax.value_and_grad(etot, has_aux=True)(x)
    return bd, -g
