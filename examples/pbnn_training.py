"""Train the PB-NN diabatic coupling (function type 3).

Demonstrates the two-stage recipe `reactive_pb_nn_md_tpu.nn.train`
packages for replacing an analytic MS-EVB off-diagonal with a neural one:

  1. `pretrain_geometric`: supervised fit of the MLP geometric factor
     A_nn(q², R_OO) against a labelled coupling surface (here: the
     MS-EVB3 analytic form itself, standing in for ab-initio data);
  2. `finetune_adiabatic`: fine-tune END-TO-END through the adiabatic
     ground-state energies of perturbed water+hydronium frames — the
     whole MS-EVB surface (enumeration, per-diabat energies, coupling,
     eigh) is differentiable with respect to the MLP parameters, and the
     gradients are exact Hellmann-Feynman c·dH·c terms.

Runs on CPU in a few minutes:

    python examples/pbnn_training.py

Measured endpoint (26 waters + H3O+, 6 frames, 345 kJ/mol energy
spread): energy RMSE vs the analytic engine 29.4 kJ/mol untrained →
2.9 pretrained → 1.4 fine-tuned.
"""

import argparse
import pathlib
import sys
import tempfile
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

from fixtures import make_water_box, write_fixture_files  # noqa: E402
from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt  # noqa: E402
from reactive_pb_nn_md_tpu.io.topfile import read_top  # noqa: E402
from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params  # noqa: E402
from reactive_pb_nn_md_tpu.topology import build_system  # noqa: E402
from reactive_pb_nn_md_tpu.models import pme  # noqa: E402
from reactive_pb_nn_md_tpu.ops import neighbors  # noqa: E402
from reactive_pb_nn_md_tpu.nn import train as nt  # noqa: E402
from reactive_pb_nn_md_tpu.nn.coupling_mlp import init_mlp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-water", type=int, default=26)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--rattle", type=float, default=0.05, help="Angstrom")
    ap.add_argument("--pretrain-steps", type=int, default=2000)
    ap.add_argument("--finetune-steps", type=int, default=25)
    args = ap.parse_args()

    tmp = pathlib.Path(tempfile.mkdtemp())
    ff_p, top_p, sim_p = write_fixture_files(tmp, msevb="yes")
    cfg = read_sim_params(sim_p)
    frame = make_water_box(args.n_water, include_h3o=True, seed=9)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    names = system.ff.atype_names
    triple = (names.index("OW"), names.index("O_h3o"), names.index("H_h3o"))
    row = jnp.asarray(system.evb.cpl_params[triple])

    # ---- frames: rattled configurations of the same box, each with its
    # own neighbor views (same static capacity -> stackable for vmap)
    x0 = jnp.asarray(frame.xyz)
    box = jnp.asarray(frame.box)
    cap = neighbors.suggest_capacity(
        system.n_atoms, float(np.prod(np.diag(frame.box))),
        system.verlet_cutoff)
    rng = np.random.default_rng(3)
    xs, fidx, pj, pm = [], [], [], []
    for _ in range(args.frames):
        xf = x0 + jnp.asarray(rng.normal(0.0, args.rattle, x0.shape))
        nl = neighbors.build_neighbor_list(xf, box, system.verlet_cutoff,
                                           cap)
        _, j, m = neighbors.neighbor_pairs(nl)
        xs.append(xf); fidx.append(nl.full_idx); pj.append(j); pm.append(m)
    xs, fidx = jnp.stack(xs), jnp.stack(fidx)
    pj, pm = jnp.stack(pj), jnp.stack(pm)
    cbw = pme.cb_half(box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=x0.dtype)

    # ---- reference adiabatic energies (analytic MS-EVB3 coupling)
    t0 = time.time()
    e_ref = nt.make_frame_energy_fn(system, topo, box, cbw)(
        None, xs, fidx, pj, pm)
    print(f"[ref] {args.frames} adiabatic energies in "
          f"{time.time() - t0:.1f}s; spread "
          f"{float(e_ref.max() - e_ref.min()):.1f} kJ/mol")

    # ---- NN system: switch the (OW, O_h3o, H_h3o) triple to type 3
    sys_nn = system.replace(evb=system.evb.replace(
        cpl_func=system.evb.cpl_func.at[triple].set(3)))
    efn = nt.make_frame_energy_fn(sys_nn, topo, box, cbw)

    nn_raw = init_mlp(jax.random.PRNGKey(5), vconst=float(row[0]),
                      dtype=jnp.float64)
    e_raw = efn(nn_raw, xs, fidx, pj, pm)
    rmse_raw = float(jnp.sqrt(jnp.mean((e_raw - e_ref) ** 2)))
    print(f"[0] untrained MLP        energy rmse {rmse_raw:10.4f} kJ/mol")

    t0 = time.time()
    nn, rmse_a = nt.pretrain_geometric(row, jax.random.PRNGKey(1),
                                       steps=args.pretrain_steps)
    e_pre = efn(nn, xs, fidx, pj, pm)
    rmse_pre = float(jnp.sqrt(jnp.mean((e_pre - e_ref) ** 2)))
    print(f"[1] pretrained on A      energy rmse {rmse_pre:10.4f} kJ/mol "
          f"(A-surface rmse {rmse_a:.4f}; {time.time() - t0:.1f}s)")

    t0 = time.time()
    nn, r0, r1 = nt.finetune_adiabatic(
        nn, sys_nn, topo, box, cbw, xs, fidx, pj, pm, e_ref,
        steps=args.finetune_steps)
    print(f"[2] finetuned end-to-end energy rmse {r1:10.4f} kJ/mol "
          f"(from {r0:.4f}; {time.time() - t0:.1f}s)")
    print(f"improvement vs untrained: {rmse_raw / max(r1, 1e-12):.0f}x")
    print("attach with system.replace(evb=system.evb.replace(nn_params=nn))"
          " and coupling function type 3 in the topology")


if __name__ == "__main__":
    main()
