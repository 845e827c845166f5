"""Author a solvated CH3SO3H box for the upstream example force field.

The upstream repo ships CH3SO3H.pmt / CH3SO3H_H2O.top but no coordinates
(example_input_files/); this builds one acid + N waters on a jittered
lattice from idealized internal coordinates, ready for equilibration.

    python make_box.py --n-water 215 --out in.gro
"""

import argparse
import math
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from reactive_pb_nn_md_tpu.io.gro import format_gro_frame  # noqa: E402


def so3h_geometry():
    """Idealized CH3SO3H heavy-atom skeleton (template order
    C_a, S_a, O_a, O_a, O_ah, H_a; bond lengths in Angstrom)."""
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
    d = np.array([0.3, -0.5, 0.81])
    h = oh + 0.97 * d / np.linalg.norm(d)
    return np.stack([c, s, o1, o2, oh, h])


def water_geometry():
    r, th = 1.012, math.radians(113.24)
    return np.array([[0.0, 0.0, 0.0],
                     [r * math.sin(th / 2), r * math.cos(th / 2), 0.0],
                     [-r * math.sin(th / 2), r * math.cos(th / 2), 0.0]])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-water", type=int, default=215)
    ap.add_argument("--spacing", type=float, default=3.1,
                    help="lattice spacing, Angstrom")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="in.gro")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    n_mol = args.n_water + 1
    n_side = math.ceil(n_mol ** (1 / 3))
    L = n_side * args.spacing

    mol_names, atom_names, mol_natom, xyz = [], [], [], []
    sites = [(i, j, k) for i in range(n_side) for j in range(n_side)
             for k in range(n_side)][:n_mol]
    for m, (i, j, k) in enumerate(sites):
        origin = (np.array([i, j, k]) + 0.5) * args.spacing
        origin += rng.uniform(-0.05, 0.05, 3)
        if m == 0:
            pos = so3h_geometry() * 0.92 + origin
            mol_names.append("so3h")
            atom_names.extend(["C_a", "S_a", "O_a", "O_a", "O_ah", "H_a"])
        else:
            pos = water_geometry() + origin
            mol_names.append("h2o")
            atom_names.extend(["OW", "HW", "HW"])
        mol_natom.append(len(pos))
        xyz.append(pos)

    out = format_gro_frame("ch3so3h in water", mol_names,
                           np.array(mol_natom, np.int32), atom_names,
                           np.concatenate(xyz), np.eye(3) * L)
    pathlib.Path(args.out).write_text(out)
    print(f"wrote {args.out}: {n_mol} molecules, box {L:.2f} A")


if __name__ == "__main__":
    main()
