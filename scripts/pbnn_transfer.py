"""PB-NN coupling transferability: train on one system, test on others.

VERDICT r4 item 7: the held-out validation so far split rattled frames of
the SAME box -- no distribution shift.  This script trains the neural
coupling (function type 3) on the small water box and evaluates the SAME
trained parameters, frozen, on systems it never saw:

  A  held-out frames of the training box         (baseline, no shift)
  B  a 2.4x larger water box, different PME grid (size/electrostatics
                                                  shift, same chemistry)
  C  the CH3SO3H acid box (upstream force field)  (chemistry shift: the
     water<->hydronium triple exists there too -- second-shell hops in
     acid->water->water chains engage it -- but solvation, charges, and
     the surrounding analytic acid couplings all differ)

and the reverse direction (train on acid-box frames, test on water).  In
every system ONLY the water<->hydronium triple (OW, O_h3o, H_h3o in the
respective type table) is switched to the NN; all other triples stay
analytic, so the RMSE isolates the transferred component.

Labels are the engine's analytic MS-EVB3 adiabatic energies (the teacher
-- a stand-in for ab initio; the workflow is identical either way).
Reported RMSEs are against each system's own analytic reference over F
rattled frames.  CPU fp64; ~15-25 min on the 1-core host.

Usage: python scripts/pbnn_transfer.py [--frames 8] [--out
       benchdata/pbnn_transfer.json]
"""

import argparse
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tests"))


def build_water(n_water, pme_grid, seed):
    import jax.numpy as jnp
    from fixtures import make_water_box, write_fixture_files
    from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
    from reactive_pb_nn_md_tpu.io.topfile import read_top
    from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
    from reactive_pb_nn_md_tpu.topology import build_system

    tmp = pathlib.Path(tempfile.mkdtemp())
    ff_p, top_p, sim_p = write_fixture_files(tmp, msevb="yes",
                                             pme_grid=pme_grid)
    cfg = read_sim_params(sim_p)
    frame = make_water_box(n_water, include_h3o=True, seed=seed)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    return system, topo, jnp.asarray(frame.xyz), jnp.asarray(frame.box)


def build_acid(n_water, pme_grid, seed):
    from reactive_pb_nn_md_tpu.run import presets
    system, cbw, cfg, ms = presets.build_acid_system(
        n_water=n_water, pme_grid=pme_grid, seed=seed, evb_max_states=32)
    return system, ms.topo, ms.state.x, ms.state.box


def make_frames(system, topo, x0, box, n_frames, rattle, seed):
    """Rattled frames + stacked neighbor views (pbnn_training.py recipe)."""
    import jax.numpy as jnp
    import numpy as np
    from reactive_pb_nn_md_tpu.ops import neighbors
    from reactive_pb_nn_md_tpu.models import pme

    cap = neighbors.suggest_capacity(
        system.n_atoms, abs(float(np.linalg.det(np.asarray(box)))),
        system.verlet_cutoff)
    rng = np.random.default_rng(seed)
    xs, fidx, pj, pm = [], [], [], []
    for _ in range(n_frames):
        xf = x0 + jnp.asarray(rng.normal(0.0, rattle, x0.shape))
        nl = neighbors.build_neighbor_list(xf, box, system.verlet_cutoff,
                                           cap)
        _, j, m = neighbors.neighbor_pairs(nl)
        xs.append(xf)
        fidx.append(nl.full_idx)
        pj.append(j)
        pm.append(m)
    cbw = pme.cb_half(box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=x0.dtype)
    return (jnp.stack(xs), jnp.stack(fidx), jnp.stack(pj), jnp.stack(pm),
            cbw)


def water_triple(system):
    names = system.ff.atype_names
    return (names.index("OW"), names.index("O_h3o"),
            names.index("H_h3o"))


def eval_system(tag, system, topo, box, cbw, frames, nn):
    """(analytic labels, NN energies, rmse, spread) on one system with the
    water triple switched to the trained NN."""
    import jax.numpy as jnp
    from reactive_pb_nn_md_tpu.nn import train as nt

    xs, fidx, pj, pm = frames
    e_ref = nt.make_frame_energy_fn(system, topo, box, cbw)(
        None, xs, fidx, pj, pm)
    sys_nn = system.replace(evb=system.evb.replace(
        cpl_func=system.evb.cpl_func.at[water_triple(system)].set(3)))
    e_nn = nt.make_frame_energy_fn(sys_nn, topo, box, cbw)(
        nn, xs, fidx, pj, pm)
    rmse = float(jnp.sqrt(jnp.mean((e_nn - e_ref) ** 2)))
    spread = float(e_ref.max() - e_ref.min())
    return {"system": tag, "rmse_kjmol": round(rmse, 4),
            "frame_energy_spread_kjmol": round(spread, 2),
            "n_frames": int(xs.shape[0])}


def train_on(system, topo, box, cbw, frames, pretrain_steps, finetune_steps,
             split=0.75):
    """Pretrain on the system's analytic A-surface + finetune on its
    frames (train split only); returns (nn, heldout report)."""
    import jax
    import jax.numpy as jnp
    from reactive_pb_nn_md_tpu.nn import train as nt

    xs, fidx, pj, pm = frames
    row = jnp.asarray(system.evb.cpl_params[water_triple(system)])
    nn, _ = nt.pretrain_geometric(row, jax.random.PRNGKey(1),
                                  steps=pretrain_steps)
    sys_nn = system.replace(evb=system.evb.replace(
        cpl_func=system.evb.cpl_func.at[water_triple(system)].set(3)))
    e_ref = nt.make_frame_energy_fn(system, topo, box, cbw)(
        None, xs, fidx, pj, pm)
    nn, report = nt.finetune_heldout(nn, sys_nn, topo, box, cbw, xs, fidx,
                                     pj, pm, e_ref, split=split,
                                     steps=finetune_steps)
    return nn, report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--rattle", type=float, default=0.05)
    ap.add_argument("--pretrain-steps", type=int, default=1500)
    ap.add_argument("--finetune-steps", type=int, default=20)
    ap.add_argument("--out", default="benchdata/pbnn_transfer.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    t0 = time.time()
    # ---- systems
    wA = build_water(26, 16, seed=9)          # train box (82 atoms)
    wB = build_water(63, 24, seed=4)          # bigger water box (193 atoms)
    ac = build_acid(26, 16, seed=2)           # acid box (upstream FF)
    frA = make_frames(wA[0], wA[1], wA[2], wA[3], args.frames,
                      args.rattle, 3)
    frB = make_frames(wB[0], wB[1], wB[2], wB[3], args.frames,
                      args.rattle, 5)
    frC = make_frames(ac[0], ac[1], ac[2], ac[3], args.frames,
                      args.rattle, 7)
    print(f"# systems built [{time.time() - t0:.0f}s]", flush=True)

    # ---- train on water A
    nn, repA = train_on(wA[0], wA[1], wA[3], frA[4], frA[:4],
                        args.pretrain_steps, args.finetune_steps)
    print(f"# trained on water ({repA}) [{time.time() - t0:.0f}s]",
          flush=True)
    rows = [
        dict(eval_system("water26 (train box, all frames)", wA[0], wA[1],
                         wA[3], frA[4], frA[:4], nn), direction="water->"),
        dict(eval_system("water63 (2.4x box, K=24)", wB[0], wB[1], wB[3],
                         frB[4], frB[:4], nn), direction="water->"),
        dict(eval_system("acid CH3SO3H/H2O (upstream FF)", ac[0], ac[1],
                         ac[3], frC[4], frC[:4], nn), direction="water->"),
    ]
    for r in rows:
        print(json.dumps(r), flush=True)

    # ---- reverse: train on the acid box, test on water
    nn2, repC = train_on(ac[0], ac[1], ac[3], frC[4], frC[:4],
                         args.pretrain_steps, args.finetune_steps)
    rows2 = [
        dict(eval_system("acid (train box, all frames)", ac[0], ac[1],
                         ac[3], frC[4], frC[:4], nn2), direction="acid->"),
        dict(eval_system("water26", wA[0], wA[1], wA[3], frA[4], frA[:4],
                         nn2), direction="acid->"),
    ]
    for r in rows2:
        print(json.dumps(r), flush=True)

    out = {"train_water_heldout": repA, "train_acid_heldout": repC,
           "transfer": rows + rows2,
           "config": vars(args), "total_s": round(time.time() - t0, 1)}
    path = pathlib.Path(args.out)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(f"# transfer artifact -> {path}")


if __name__ == "__main__":
    main()
