"""Preset benchmark/production configurations.

The upstream repo ships force-field/topology files for its headline
CH3SO3H/H2O MS-EVB system (example_input_files/CH3SO3H.pmt +
CH3SO3H_H2O.top) but no coordinates; these builders author the boxes the
BASELINE configs name:

  * acid_box:      1 CH3SO3H + N waters (config 1, the named system)
  * acid_mixture:  1 protonated CH3SO3H + K CH3SO3- anions + waters
                   (config 3, the ~5k-atom concentrated acid).  Exactly
                   one protonated species, matching the reference's
                   hard constraint of a single acid-state molecule
                   (ms_evb.f90:122-133); the deprotonated so3- anions
                   are proton ACCEPTORS, so hop chains exercise both
                   conjugate pairs (so3h/so3 and h3o/h2o).  The box
                   carries net charge -K; like the reference, PME drops
                   the k=0 term, i.e. a uniform neutralizing background.

Geometries are idealized internal coordinates on a jittered lattice,
ready for equilibration (scripts/equilibrate.py).
"""

import math
import os
import pathlib

import numpy as np

from ..io.gro import GroFrame

REF_DIR = os.environ.get(
    "REACTIVE_PB_NN_REF_DIR", "/root/reference/example_input_files")


def so3h_geometry():
    """CH3SO3H heavy-atom skeleton (template order C_a, S_a, O_a, O_a,
    O_ah, H_a; bond lengths in Angstrom)."""
    c = np.array([0.0, 0.0, 0.0])
    s = np.array([1.81, 0.0, 0.0])

    def sdir(theta_deg, phi_deg, r):
        t, p = math.radians(theta_deg), math.radians(phi_deg)
        return s + r * np.array([math.cos(t),
                                 math.sin(t) * math.cos(p),
                                 math.sin(t) * math.sin(p)])

    o1 = sdir(110, 90, 1.45)
    o2 = sdir(110, 210, 1.45)
    oh = sdir(110, 330, 1.62)
    # proton along the S->O(H) direction, tilted ~30 deg off-axis: keeps
    # S..H at ~2.4 A (a fixed lab-frame direction previously landed the
    # H 0.87 A from S -- inside the sulfur, a catastrophic start)
    u = (oh - s) / np.linalg.norm(oh - s)
    perp = np.cross(u, np.array([0.0, 0.0, 1.0]))
    perp /= np.linalg.norm(perp)
    h = oh + 0.97 * (0.87 * u + 0.5 * perp)
    return np.stack([c, s, o1, o2, oh, h])


def so3_geometry():
    """CH3SO3- (template order C_b, S_b, O_b, O_b, O_b)."""
    return so3h_geometry()[:5]


def water_geometry():
    r, th = 1.012, math.radians(113.24)
    return np.array([[0.0, 0.0, 0.0],
                     [r * math.sin(th / 2), r * math.cos(th / 2), 0.0],
                     [-r * math.sin(th / 2), r * math.cos(th / 2), 0.0]])


_TEMPLATES = {
    "so3h": (so3h_geometry, ["C_a", "S_a", "O_a", "O_a", "O_ah", "H_a"]),
    "so3": (so3_geometry, ["C_b", "S_b", "O_b", "O_b", "O_b"]),
    "h2o": (water_geometry, ["OW", "HW", "HW"]),
}


def make_acid_frame(n_water=215, n_so3=0, spacing=3.1, seed=0,
                    jitter=0.05) -> GroFrame:
    """Jittered-lattice box: 1 so3h + n_so3 so3- + n_water h2o.

    Acid-family molecules span ~3 A, so each acid is CENTERED on its
    site and its six face-adjacent sites are left empty (un-centered
    acids reached into neighbor sites and the resulting contacts
    exceeded the engine's 1e4 kJ/mol/A force abort even after a
    small-dt quench)."""
    rng = np.random.default_rng(seed)
    n_acid = 1 + n_so3
    n_mol = n_acid + n_water
    # slack sites for the blocked acid neighborhoods; the BOX keeps the
    # target per-molecule volume (spacing^3 per water, ~3x for an acid),
    # so the occupied-site spacing is slightly tighter than `spacing` --
    # the equilibration quench relaxes that
    n_side = math.ceil((n_mol + 7 * n_acid) ** (1 / 3))
    L = max((n_mol + 2 * n_acid) ** (1 / 3) * spacing, 11.5)
    spacing = L / n_side

    all_sites = [(i, j, k) for i in range(n_side) for j in range(n_side)
                 for k in range(n_side)]
    perm = rng.permutation(len(all_sites))
    blocked = set()
    acid_sites = []
    for idx in perm:
        if len(acid_sites) == n_acid:
            break
        s = all_sites[idx]
        if s in blocked:
            continue
        acid_sites.append(s)
        blocked.add(s)
        for d in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                  (0, 0, 1), (0, 0, -1)):
            blocked.add(((s[0] + d[0]) % n_side, (s[1] + d[1]) % n_side,
                         (s[2] + d[2]) % n_side))
    water_sites = [all_sites[i] for i in perm
                   if all_sites[i] not in blocked][:n_water]
    if len(water_sites) < n_water or len(acid_sites) < n_acid:
        raise ValueError("lattice too small for the requested mixture")

    placements = [("so3h", acid_sites[0])] \
        + [("so3", s) for s in acid_sites[1:]] \
        + [("h2o", s) for s in water_sites]

    mol_names, atom_names, mol_first, mol_natom, xyz = [], [], [], [], []
    count = 0
    for name, (i, j, k) in placements:
        origin = (np.array([i, j, k]) + 0.5) * spacing
        origin += rng.uniform(-jitter, jitter, 3)
        geom_fn, anames = _TEMPLATES[name]
        pos = geom_fn()
        pos = pos - pos.mean(axis=0) + origin     # center on the site
        mol_names.append(name)
        atom_names.extend(anames)
        mol_first.append(count)
        mol_natom.append(len(pos))
        count += len(pos)
        xyz.append(pos)
    return GroFrame(title="ch3so3h box", mol_names=mol_names,
                    mol_first_atom=np.array(mol_first, np.int32),
                    mol_natom=np.array(mol_natom, np.int32),
                    atom_names=atom_names, xyz=np.concatenate(xyz),
                    box=np.eye(3) * L)


# n_exclusions MUST be 3 for this force field.  At n_exclusions 2 the
# exactly-3-bond pairs (H_a..O_a, H_a..C_a) carry exclusion code 2 =
# full Coulomb + 1-4 vdW -- but H_a has no LJ well, so the pair's vdW
# dispatch type is -1 ("none") and BOTH engines skip vdW for it (the
# reference consults atype_vdw_parameter_14 only inside its LJ branch,
# pair_int_real_space.f90:477-481, which type -1 never reaches; the
# CH3SO3H.pmt pairtypes rows for H_a are dead config).  Bare Coulomb
# with no core lets the acid proton collapse into its own S=O oxygen --
# a reproduced force singularity that slingshots it out of the
# molecule.  n_exclusions 3 excludes those pairs entirely, which is the
# only stable configuration for this file as shipped.
ACID_SIM_PMT = """Simulation Methodology
ensemble           NVE
lj_comb_rule       opls
ms_evb_simulation  yes
Simulation Parameters
n_step             100
n_output           100
n_exclusions       3
temperature        300.0
delta_t            0.0005
real_space_cutoff  4.5
verlet_cutoff      5.5
alpha_sqrt         0.7
pme_grid           {pme_grid}
spline_order       6
n_threads          1
precision          {precision}
evb_max_states     {evb_max_states}
"""


def build_acid_system(n_water=215, n_so3=0, pme_grid=32, seed=0,
                      precision="fp32", evb_max_states=80,
                      ref_dir=REF_DIR, extra_sim=""):
    """(system, cbw, cfg, ms) for the CH3SO3H presets, analogous to the
    flagship fixture builder -- upstream force-field files, idealized
    lattice coordinates, Maxwell-Boltzmann velocities at 300 K."""
    import tempfile
    import jax
    import jax.numpy as jnp
    from ..io.ffpmt import read_ffpmt
    from ..io.topfile import read_top
    from ..io.simpmt import read_sim_params
    from ..topology import build_system, State
    from ..models import pme
    from ..ops import neighbors
    from ..md import integrators, velocities
    from ..utils.dtypes import default_float

    tmp = pathlib.Path(tempfile.mkdtemp())
    sim_p = tmp / "sim.pmt"
    sim_p.write_text(ACID_SIM_PMT.format(
        pme_grid=pme_grid, precision=precision,
        evb_max_states=evb_max_states) + extra_sim)
    cfg = read_sim_params(str(sim_p))
    frame = make_acid_frame(n_water=n_water, n_so3=n_so3, seed=seed)
    system, topo = build_system(
        frame, read_ffpmt(os.path.join(ref_dir, "CH3SO3H.pmt")),
        read_top(os.path.join(ref_dir, "CH3SO3H_H2O.top")), cfg)
    fdt = default_float()
    key = jax.random.PRNGKey(seed)
    key, vkey = jax.random.split(key)
    mobile = velocities.freeze_mask(system, topo)
    v = velocities.sample_velocities(vkey, system.mass, 300.0, mobile)
    state = State(x=jnp.asarray(frame.xyz, fdt), v=v,
                  box=jnp.asarray(frame.box, fdt), key=key,
                  step=jnp.asarray(0, jnp.int32))
    cbw = pme.cb_half(state.box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=fdt)
    vol = float(np.prod(np.diag(frame.box)))
    cap = neighbors.suggest_capacity(system.n_atoms, vol,
                                     system.verlet_cutoff)
    ms = integrators.initial_md_state(state, topo, system, cbw, cap)
    return system, cbw, cfg, ms


def soften_for_hops(system, coupling_scale=2.0, da_scale=0.5,
                    pa_scale=0.5, c12_scale=1.0, c12_pair=("O_h3o", "OW")):
    """A DOCUMENTED softening of the EVB surface that brings the
    proton-transfer barrier down to thermally accessible heights, for
    demonstrating spontaneous (unseeded) proton transport.

    The fixture's published MS-EVB3 constants put the flagship liquid's
    transfer barrier far above kT at 300-600 K (measured round 4: minimum
    first-shell diabat gap ~ +145 kJ/mol at |V| ~ 100; no unseeded hop in
    1 ps at 600 K), so the physics demonstration needs a parameterization
    whose barrier is O(kT).  Knobs (all physically interpretable):

      coupling_scale : multiplies Vconst (cpl_params[..., 0], eq. 10
                       prefactor, ms_evb.f90:1196-1231) -- deepens the
                       adiabatic well at the crossing seam.
      da_scale       : multiplies the 3-atom donor-acceptor repulsion
                       prefactor B (da_params[..., 0], eq. 7 of MS-EVB3,
                       ms_evb.f90:2295-2399) -- cheapens O-O compression.
      pa_scale       : multiplies the Born-Mayer proton-acceptor prefactor
                       C (pa_params[..., 0], ms_evb.f90:2405-2478).
      c12_scale      : multiplies the C12 core of the named LJ cross pair
                       (default hydronium-O vs water-O) in BOTH orders --
                       also cheapens bridging R_OO distances.

    Scales default to a mild softening; scripts/spontaneous_hops.py scans
    them against the umbrella PMF barrier (scripts/umbrella_pmf.py) until
    the barrier is ~2-4 kT, then measures the unseeded hop rate."""
    evb = system.evb
    evb = evb.replace(
        cpl_params=evb.cpl_params.at[..., 0].mul(coupling_scale),
        da_params=evb.da_params.at[..., 0].mul(da_scale),
        pa_params=evb.pa_params.at[..., 0].mul(pa_scale))
    ff = system.ff
    if c12_scale != 1.0 and c12_pair:
        names = list(ff.atype_names)
        i, j = names.index(c12_pair[0]), names.index(c12_pair[1])
        vp = ff.vdw_params.at[i, j, 0].mul(c12_scale)
        vp = vp.at[j, i, 0].mul(c12_scale)
        ff = ff.replace(vdw_params=vp)
    return system.replace(evb=evb, ff=ff)
