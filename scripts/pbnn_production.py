"""PB-NN coupling driving a PRODUCTION Simulation, vs the analytic twin.

VERDICT r4 item 7b: trained NN coupling params had only ever driven the
bench's md_scan, never the full production driver (md/simulation.py --
the 8-file contract with trajectory/log/hop outputs).  This script runs
the SAME flagship deck twice through `Simulation`:

  A  analytic MS-EVB3 coupling, softened surface (bench.SPONT_SCALES so
     hops actually occur in a short window)
  B  the coupling MLP (cpl_func=3), pretrained in-process on A's
     softened analytic geometric surface, attached via
     Simulation.mutate_system -- same softening elsewhere

and compares hop statistics from the two hop files plus throughput.
A well-trained NN should reproduce the analytic surface's hop dynamics
statistically (identical trajectories are NOT expected: the surfaces
differ by the fit residual, and reactive MD is chaotic).

Usage: python scripts/pbnn_production.py [--steps 1536]
       [--out benchdata/pbnn_production.json]
"""

import argparse
import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tests"))

DECK = pathlib.Path(__file__).resolve().parent.parent / "examples" \
    / "water_msevb"


def run_one(tag, steps, nn_attach, workdir, scales):
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    g._enable_compile_cache()
    from reactive_pb_nn_md_tpu.md.simulation import Simulation
    from reactive_pb_nn_md_tpu.run import presets
    from reactive_pb_nn_md_tpu.nn import train as nt

    wd = pathlib.Path(workdir) / tag
    wd.mkdir(parents=True)
    # fp32 deck copy -> accelerator path
    for f in ("in.gro", "ff.pmt", "top.top"):
        shutil.copy(DECK / f, wd / f)
    sim_txt = (DECK / "sim.pmt").read_text().replace("fp64", "fp32")
    # output every 128 steps: the deck's n_output 10 fragments the device
    # scan into 10-step dispatches (~28 ms dispatch floor each)
    sim_txt = sim_txt.replace("n_output           10",
                              "n_output           128")
    (wd / "sim.pmt").write_text(sim_txt)

    sim = Simulation(str(wd / "in.gro"), str(wd / "ff.pmt"),
                     str(wd / "top.top"), str(wd / "sim.pmt"),
                     str(wd / "traj.out"), str(wd / "log.out"),
                     str(wd / "hop.out"), str(wd / "a.out"),
                     checkpoint_file=str(wd / "chk.npz"))

    def mutate(system):
        system = presets.soften_for_hops(system, **scales)
        if nn_attach:
            names = system.ff.atype_names
            triple = (names.index("OW"), names.index("O_h3o"),
                      names.index("H_h3o"))
            row = jnp.asarray(system.evb.cpl_params[triple])
            nn, rmse = nt.pretrain_geometric(row, jax.random.PRNGKey(3),
                                             steps=1500,
                                             dtype=jnp.float32)
            print(f"# [{tag}] pretrained MLP on the softened analytic "
                  f"A-surface, rmse {rmse:.4f}", flush=True)
            system = system.replace(evb=system.evb.replace(
                cpl_func=system.evb.cpl_func.at[triple].set(3),
                nn_params=nn))
        return system

    sim.mutate_system(mutate)
    t0 = time.time()
    sim.run(n_steps=steps, quiet=True)
    wall = time.time() - t0

    hop_lines = [ln for ln in (wd / "hop.out").read_text().splitlines()
                 if ln.strip()]
    # hop file lines carry "step N ... donor -> acceptor" style records;
    # count lines and distinct acceptor molecules
    import re
    mols = set()
    for ln in hop_lines:
        nums = re.findall(r"-?\d+", ln)
        if nums:
            mols.update(nums[-2:])
    return {"tag": tag, "steps": steps,
            "steps_per_s": round(steps / wall, 1),
            "hops": len(hop_lines),
            "distinct_mols_in_hop_log": len(mols),
            "log_tail": (wd / "log.out").read_text().splitlines()[-2:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1536)
    ap.add_argument("--out", default="benchdata/pbnn_production.json")
    args = ap.parse_args()
    import bench
    scales = bench.SPONT_SCALES

    tmp = tempfile.mkdtemp()
    a = run_one("analytic", args.steps, False, tmp, scales)
    print(json.dumps(a), flush=True)
    b = run_one("pbnn", args.steps, True, tmp, scales)
    print(json.dumps(b), flush=True)

    out = {"scales": scales, "analytic": a, "pbnn": b}
    path = pathlib.Path(args.out)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(f"# production NN-vs-analytic artifact -> {path}")


if __name__ == "__main__":
    main()
