"""Author a solvated CH3SO3H box for the upstream example force field.

The upstream repo ships CH3SO3H.pmt / CH3SO3H_H2O.top but no coordinates
(example_input_files/); this writes one via the preset builders
(reactive_pb_nn_md_tpu.run.presets), ready for equilibration.

    python make_box.py --n-water 215 --out in.gro
    python make_box.py --n-water 1627 --n-so3 23 --out acid5k.gro
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from reactive_pb_nn_md_tpu.io.gro import format_gro_frame  # noqa: E402
from reactive_pb_nn_md_tpu.run.presets import make_acid_frame  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-water", type=int, default=215)
    ap.add_argument("--n-so3", type=int, default=0,
                    help="deprotonated CH3SO3- anions (concentrated acid)")
    ap.add_argument("--spacing", type=float, default=3.1,
                    help="lattice spacing, Angstrom")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="in.gro")
    args = ap.parse_args()

    frame = make_acid_frame(n_water=args.n_water, n_so3=args.n_so3,
                            spacing=args.spacing, seed=args.seed)
    with open(args.out, "w") as f:
        f.write(format_gro_frame(frame.title, frame.mol_names,
                                 frame.mol_natom, frame.atom_names,
                                 frame.xyz, frame.box))
    print(f"wrote {args.out}: {frame.n_mole} molecules, "
          f"{len(frame.atom_names)} atoms")


if __name__ == "__main__":
    main()
