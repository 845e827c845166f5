"""Test fixtures: a small SPC/Fw water + hydronium MS-EVB system.

Force-field and MS-EVB3 parameters are the published MS-EVB3 water model
values (Wu et al., JPC B 2008, 112, 467; same parameter set the reference's
example files use)."""

import io
import math

import numpy as np

from reactive_pb_nn_md_tpu.io.gro import GroFrame

WATER_FF_PMT = """
solute_species
atom_type_parameters
4
OW    -0.82    0.6502995   3.16549   0.0  0.0
HW     0.41    0.0         0.0       0.0  0.0
O_h3o -0.5     0.0         0.0       0.0  0.0
H_h3o  0.5     0.0         0.0       0.0  0.0

cross_terms  c6 (kJ/mol *ang^6)    C12  (kJ/mol *ang^12)
2
3   1   1993.468    1917990.0   0
4   1   0.660773    10.38771    0
"""

WATER_TOP = """
[ bondtypes ]
  OW    HW      1    1.012   4431.5338
  O_h3o    H_h3o      3     372.2086     2.1               1.0

[ angletypes ]
  HW     OW    HW      1   113.24    317.5656
  H_h3o     O_h3o    H_h3o      1   111.7269  324.20477

[ dihedraltypes ]
OW   HW   HW  HW         2       35.26439   334.84617

[ evb_parameters ]

[ reference_energy ]
h3o          0.0

[ adiabat_non_bond ]
[ donor_acceptor ]
 OW     O_h3o    H_h3o     47.1118977    1.1    2.4   2.12     2.85    3.05

[ proton_acceptor ]
 OW      H_h3o        19.1274639       2.1     1.0     2.3     2.5

[ diabat_coupling ]
[ geometry_factor ]
 OW     O_h3o    H_h3o     -97.0151921   1.8302895   0.232726   9.562153   2.94   6.0179066   3.1   10.8831327   10.0380922   1.8136426

[ exchange_charge_atomic ]
  OW      -0.0895456
  O_h3o   -0.0895456
  HW       0.0252683
  H_h3o    0.0252683

[ exchange_charge_proton ]
  h3o      h2o        0.078018

[ moleculetype ]
h2o   3

[ atoms ]
  1   OW    16.0
  2   HW     1.008
  3   HW     1.008

[ bonds ]
1	2	1
1	3	1

[ angles ]
2	1	3	1

[ dihedrals ]

[ moleculetype ]
h3o 3

[ atoms ]
  1   O_h3o    16.0
  2   H_h3o     1.008
  3   H_h3o     1.008
  4   H_h3o     1.008

[ bonds ]
1	2	3
1	3	3
1	4	3

[ angles ]
2	1	3	1
2	1	4	1
3	1	4	1

[ dihedrals ]

[ evb_topology ]

[ evb_pairs ]
h3o    h2o    H_h3o   O_h3o

[ acid_reactive_protons ]
   1   0
   2   1
   3   1
   4   1

[ base_reactive_protons ]
   1   0
   2   1
   3   1

[ acid_acceptor_atoms ]
   1   1
   2   0
   3   0
   4   0

[ base_acceptor_atoms ]
   1   1
   2   0
   3   0

[ conjugate_atoms ]
O_h3o   OW
H_h3o   HW
"""

SIM_PMT_TEMPLATE = """Simulation Methodology
ensemble           {ensemble}
lj_comb_rule       opls
ms_evb_simulation  {msevb}
Simulation Parameters
n_step             {n_step}
n_output           {n_output}
n_exclusions       2
temperature        300.0
pressure           1.0
barofreq           3
delta_t            0.0005
real_space_cutoff  {cutoff}
verlet_cutoff      {verlet_cutoff}
alpha_sqrt         {alpha}
pme_grid           {pme_grid}
spline_order       6
n_threads          1
precision          fp64
{extra}"""

# the same h3o, with the template's ATOM SLOT ORDER permuted (a proton
# first): exercises that nothing assumes the acidic proton is the last
# template slot (cf. VERDICT r1: coupling_element heuristic)
WATER_TOP_H3O_REORDERED = WATER_TOP.replace(
    """[ moleculetype ]
h3o 3

[ atoms ]
  1   O_h3o    16.0
  2   H_h3o     1.008
  3   H_h3o     1.008
  4   H_h3o     1.008

[ bonds ]
1	2	3
1	3	3
1	4	3

[ angles ]
2	1	3	1
2	1	4	1
3	1	4	1
""",
    """[ moleculetype ]
h3o 3

[ atoms ]
  1   H_h3o     1.008
  2   O_h3o    16.0
  3   H_h3o     1.008
  4   H_h3o     1.008

[ bonds ]
2	1	3
2	3	3
2	4	3

[ angles ]
1	2	3	1
1	2	4	1
3	2	4	1
""").replace(
    """[ acid_reactive_protons ]
   1   0
   2   1
   3   1
   4   1
""",
    """[ acid_reactive_protons ]
   1   1
   2   0
   3   1
   4   1
""").replace(
    """[ acid_acceptor_atoms ]
   1   1
   2   0
   3   0
   4   0
""",
    """[ acid_acceptor_atoms ]
   1   0
   2   1
   3   0
   4   0
""")


def water_geometry(jitter=0.0, rng=None):
    """One water: O at origin, H's at 1.012 A, 113.24 deg."""
    r = 1.012
    th = math.radians(113.24)
    pos = np.array([
        [0.0, 0.0, 0.0],
        [r * math.sin(th / 2), r * math.cos(th / 2), 0.0],
        [-r * math.sin(th / 2), r * math.cos(th / 2), 0.0],
    ])
    if jitter and rng is not None:
        pos = pos + rng.normal(scale=jitter, size=pos.shape)
    return pos


def h3o_geometry(jitter=0.0, rng=None):
    """Hydronium: trigonal pyramid, O-H 1.0 A."""
    r = 1.0
    pos = [[0.0, 0.0, 0.0]]
    for k in range(3):
        ang = 2 * math.pi * k / 3
        pos.append([r * 0.94 * math.cos(ang), r * 0.94 * math.sin(ang),
                    r * 0.35])
    pos = np.array(pos)
    if jitter and rng is not None:
        pos = pos + rng.normal(scale=jitter, size=pos.shape)
    return pos


def make_water_box(n_water, include_h3o=True, spacing=3.1, jitter=0.05,
                   seed=0, h3o_reordered=False):
    """Build a GroFrame: waters (+ one hydronium) on a cubic lattice."""
    rng = np.random.default_rng(seed)
    n_mol = n_water + (1 if include_h3o else 0)
    n_side = math.ceil(n_mol ** (1.0 / 3.0))
    box_len = n_side * spacing

    mol_names, atom_names, mol_first, mol_natom = [], [], [], []
    xyz = []
    sites = [(i, j, k) for i in range(n_side) for j in range(n_side)
             for k in range(n_side)][:n_mol]
    # hydronium in the middle of the list so it has neighbors
    h3o_index = n_mol // 2 if include_h3o else -1

    count = 0
    for m, (i, j, k) in enumerate(sites):
        origin = (np.array([i, j, k]) + 0.5) * spacing
        origin += rng.uniform(-jitter, jitter, size=3)
        if m == h3o_index:
            pos = h3o_geometry(jitter, rng) + origin
            if h3o_reordered:
                # slot order H, O, H, H (matches WATER_TOP_H3O_REORDERED)
                pos = pos[[1, 0, 2, 3]]
                atom_names.extend(["H_h3o", "O_h3o", "H_h3o", "H_h3o"])
            else:
                atom_names.extend(["O_h3o", "H_h3o", "H_h3o", "H_h3o"])
            mol_names.append("h3o")
        else:
            pos = water_geometry(jitter, rng) + origin
            mol_names.append("h2o")
            atom_names.extend(["OW", "HW", "HW"])
        mol_first.append(count)
        mol_natom.append(len(pos))
        count += len(pos)
        xyz.append(pos)

    xyz = np.concatenate(xyz, axis=0)
    box = np.eye(3) * box_len
    return GroFrame(title="fixture water box", mol_names=mol_names,
                    mol_first_atom=np.array(mol_first, dtype=np.int32),
                    mol_natom=np.array(mol_natom, dtype=np.int32),
                    atom_names=atom_names, xyz=xyz, box=box)


def write_fixture_files(tmpdir, ensemble="NVE", msevb="yes", n_step=10,
                        cutoff=4.5, verlet_cutoff=5.5, alpha=0.7,
                        pme_grid=32, n_output=100, extra="",
                        h3o_reordered=False):
    ff = tmpdir / "ff.pmt"
    top = tmpdir / "top.top"
    sim = tmpdir / "sim.pmt"
    ff.write_text(WATER_FF_PMT)
    top.write_text(WATER_TOP_H3O_REORDERED if h3o_reordered else WATER_TOP)
    sim.write_text(SIM_PMT_TEMPLATE.format(
        ensemble=ensemble, msevb=msevb, n_step=n_step, cutoff=cutoff,
        verlet_cutoff=verlet_cutoff, alpha=alpha, pme_grid=pme_grid,
        n_output=n_output, extra=extra))
    return str(ff), str(top), str(sim)
