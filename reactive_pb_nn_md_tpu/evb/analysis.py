"""EVB trajectory analysis utilities.

Counterparts of the reference's analysis extras (ms_evb.f90:3684-3848):

  hbond_network   : donor/acceptor hydrogen-bond counts around the
                    hydronium (get_hbond_neighbors / get_h3o_network),
                    geometric criterion r_OO < 3.6 A, r_HO < 2.41 A,
                    O-O-H angle < 30 degrees
  zundel_geometry : donor/acceptor coordinates + A factor for the debug=2
                    stream (write_geometry)
  diabat_report   : per-diabat hydronium molecule, c_i^2 and solvation
                    shell (print_evb_trajectory_data, ms_evb.f90:3128-3162)
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..topology import System, Topology
from ..utils import pbc


def hbond_network(x, box, topo: Topology, system: System,
                  roo_cut=3.6, rho_cut=2.41, angle_cut_deg=30.0):
    """(n_acceptors, n_donors) H-bond counts around the hydronium."""
    h = topo.hydronium_mol
    mt = topo.mol_mtype[h]
    atoms = jnp.maximum(topo.mol_atoms[h], 0)
    amask = topo.mol_atoms[h] >= 0
    heavy = atoms[jnp.maximum(system.mt.heavy_slot[mt], 0)]
    proton_t = system.mt.proton_atype[mt]
    types = jnp.where(amask, topo.atom_type[atoms], -1)
    is_proton = types == proton_t

    # candidate water oxygens: reactive base atoms of other molecules
    base = (system.mt.reactive_bases[topo.mol_mtype[topo.atom_mol],
                                     topo.atom_slot] > 0) \
        & (topo.atom_mol != h)

    o1 = x[heavy]
    d_o = pbc.min_image(x - o1[None, :], box)            # (N,3) O1 -> O0
    roo = jnp.sqrt(jnp.sum(d_o * d_o, -1))
    near = base & (roo < roo_cut)

    cos_cut = np.cos(np.radians(angle_cut_deg))

    # hydronium donates: its protons H1 with r(H1,O0) < rho_cut and
    # angle(O1->O0, O1->H1) < 30 deg
    xh = x[atoms]                                         # (A,3)
    d_h = xh - o1[None, :]                                # O1 -> H1
    d_h_norm = jnp.sqrt(jnp.maximum(jnp.sum(d_h * d_h, -1), 1e-12))
    dho = pbc.min_image(x[None, :, :] - xh[:, None, :], box)   # (A,N,3)
    rho = jnp.sqrt(jnp.sum(dho * dho, -1))
    cosang = (d_o[None, :, :] * d_h[:, None, :]).sum(-1) \
        / (roo[None, :] * d_h_norm[:, None] + 1e-12)
    donate = (is_proton[:, None] & near[None, :] & (rho < rho_cut)
              & (cosang > cos_cut))
    n_accept = int(jnp.sum(donate))    # waters accepting from hydronium

    # hydronium accepts: water protons H0 with r(H0,O1) < rho_cut and
    # angle(O0->O1, O0->H0) < 30 deg
    # any atom (slot > 0) whose molecule's slot-0 atom is a near base oxygen
    mol0 = jnp.maximum(topo.mol_atoms[topo.atom_mol, 0], 0)
    is_water_h = (topo.atom_slot > 0) & near[mol0]
    o0 = x[mol0]                                          # (N,3) own oxygen
    d_ho1 = pbc.min_image(o1[None, :] - x, box)
    rh_o1 = jnp.sqrt(jnp.sum(d_ho1 * d_ho1, -1))
    d_oo1 = pbc.min_image(o1[None, :] - o0, box)
    d_oh = x - o0
    cosang2 = jnp.sum(d_oo1 * d_oh, -1) / (
        jnp.sqrt(jnp.maximum(jnp.sum(d_oo1 * d_oo1, -1), 1e-12))
        * jnp.sqrt(jnp.maximum(jnp.sum(d_oh * d_oh, -1), 1e-12)))
    donate2 = is_water_h & (rh_o1 < rho_cut) & (cosang2 > cos_cut)
    n_donate = int(jnp.sum(donate2))

    return n_accept, n_donate


def diabat_report(hydronium_of, n_hops, eigenvector, n_states):
    """Rows of (state, hydronium molecule, c_i^2, solvation shell).

    Accepts the per-state arrays directly (they are carried in MDState so
    the driver can print the reference's per-diabat block,
    print_evb_trajectory_data ms_evb.f90:3128-3162, without re-running the
    enumeration)."""
    rows = []
    c = np.asarray(eigenvector)
    hyd = np.asarray(hydronium_of)
    nh = np.asarray(n_hops)
    for s in range(int(n_states)):
        rows.append((s + 1, int(hyd[s]) + 1, float(c[s] ** 2), int(nh[s])))
    return rows


def format_diabat_report(step, rows):
    """The reference's per-output-step EVB block (ms_evb.f90:3128-3162):
    diabat count then one row per diabat."""
    lines = [f" i_step {step} number of diabats {len(rows)}"]
    for s, hyd_mol, ci2, shell in rows:
        lines.append(f"  diabat {s:3d} hydronium_molecule {hyd_mol:6d} "
                     f"ci^2 {ci2:10.6f} solvation_shell {shell:2d}")
    lines.append("")
    return "\n".join(lines)


def zundel_diagnostics(x, box, topo_d, system, donor_mol, acceptor_mol,
                       proton_atom, d_heavy=None, a_heavy=None):
    """Geometric factor A and the donor/acceptor coordinates for one diabat
    (the debug=2 A-file content, ms_evb.f90:1079-1081 + write_geometry).

    topo_d must be the diabat's topology (acceptor protonated);
    proton_atom / d_heavy / a_heavy are global indices from the hop log
    (cols 1/2/4).  The heavy indices fall back to the template heavy-slot
    lookup when not given -- correct only for monoprotic bases like water
    (see models/coupling.coupling_element)."""
    import numpy as np
    from ..models import coupling as cpl
    mt = system.mt
    d = int(donor_mol)
    a = int(acceptor_mol)
    d_mtype = int(topo_d.mol_mtype[d])
    a_mtype = int(topo_d.mol_mtype[a])
    if d_heavy is None:
        d_heavy = int(topo_d.mol_atoms[d,
                                       max(int(mt.heavy_slot[d_mtype]), 0)])
    if a_heavy is None:
        a_heavy = int(topo_d.mol_atoms[a,
                                       max(int(mt.heavy_slot[a_mtype]), 0)])
    d_heavy, a_heavy = int(d_heavy), int(a_heavy)
    proton = int(proton_atom)

    r_o1 = x[d_heavy]
    r_o2 = r_o1 + pbc.min_image(x[a_heavy] - r_o1, box)
    r_h = r_o1 + pbc.min_image(x[proton] - r_o1, box)
    q_vec = (r_o1 + r_o2) / 2.0 - r_h
    r_oo = r_o1 - r_o2

    t1 = int(topo_d.atom_type[d_heavy])
    t2 = int(topo_d.atom_type[a_heavy])
    t3 = int(topo_d.atom_type[proton])
    func = system.evb.cpl_func[t1, t2, t3]
    params = system.evb.cpl_params[t1, t2, t3]
    a_fac = float(cpl.geometric_factor(func, params, q_vec, r_oo))

    names = system.ff.atype_names

    def block(mol):
        atoms = [int(v) for v in np.asarray(topo_d.mol_atoms[mol]) if v >= 0]
        return ([names[int(topo_d.atom_type[g])] for g in atoms],
                np.asarray(x)[atoms])

    dn, dx = block(d)
    an, ax = block(a)
    return a_fac, dn, dx, an, ax


def format_zundel_geometry(a_factor, donor_names, donor_xyz,
                           acceptor_names, acceptor_xyz):
    """debug=2 A-file block (write_geometry, ms_evb.f90:3828-3848)."""
    lines = ["Donor Coordinates"]
    for nm, p in zip(donor_names, donor_xyz):
        lines.append(f" {nm} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    lines.append("Acceptor Coordinates")
    for nm, p in zip(acceptor_names, acceptor_xyz):
        lines.append(f" {nm} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    lines.append(f" A {a_factor}")
    lines.append("")
    return "\n".join(lines)
