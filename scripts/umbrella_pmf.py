"""Proton-transfer PMF by umbrella sampling on the flagship liquid.

BASELINE config 5's scientific deliverable: a W-window harmonic ladder on
the proton asymmetric-stretch coordinate delta r_OH (md/bias.py cv_type 0)
between the hydronium oxygen and its nearest-neighbor water oxygen, run as
ONE vmapped replica batch on the TPU (parallel/umbrella.py), estimated
with WHAM + block bootstrap (analysis/wham.py).

A soft R_OO keeper restraint holds the donor/acceptor pair at bridging
distance (standard umbrella practice for transfer coordinates -- without
it the outer windows drift apart and the coordinate loses its meaning).
The reported PMF is therefore the transfer profile AT bridging R_OO, the
quantity whose barrier controls the hop rate (reference geometry
ms_evb.f90:1117-1266; hop machinery :330-336).

Usage:
  python scripts/umbrella_pmf.py [--windows 16] [--span 0.65] [--k 400]
      [--k-roo 100] [--r-oo 2.5] [--equil 1500] [--sample 6000]
      [--chunk 250] [--temperature 300] [--states 48]
      [--out benchdata/pmf_flagship.json] [--small]

Writes a JSON artifact: centers, spring constants, per-window CV
mean/std, PMF (bin centers, values, bootstrap std), barrier, throughput.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tests"))


def run_pmf(n_windows=16, span=0.65, k_spring=400.0, k_roo=100.0,
            r_oo=2.5, n_equil=1500, n_sample=6000, chunk=250,
            temperature=300.0, evb_max_states=48, small=False,
            friction=5.0, build=None, verbose=True, max_vmap=None,
            dimer=False):
    """Returns (result dict, batch).  `build` optionally injects a custom
    (system, cbw, cfg, ms) tuple (bench.py passes the equilibrated
    flagship; tests pass a tiny box)."""
    import numpy as np
    import jax
    import bench
    import __graft_entry__ as g
    g._enable_compile_cache()
    from reactive_pb_nn_md_tpu.parallel import umbrella
    from reactive_pb_nn_md_tpu.analysis import wham

    t0 = time.time()
    if build is not None:
        system, cbw, cfg, ms = build
    elif dimer:
        # the isolated Zundel pair H3O+ . H2O in a 10 A box: the CLEAN
        # transfer-PMF system.  In the bulk liquid the excess proton
        # escapes a restrained pair through the hydronium's OTHER protons
        # (measured round 5: windows wander, state sets overflow, WHAM
        # sees a mixture of reactions), which is a real feature of fast
        # Grotthuss transport, not a fixable protocol detail -- a bulk
        # transfer PMF needs an indicator coordinate (CEC).  The dimer
        # has nowhere to wander: identity can only swap WITHIN the
        # restrained pair, so F(xi | R_OO) is exactly the textbook Zundel
        # double well and its R_OO dependence is the O-O compression
        # story (cf. the reference's geometry factor, ms_evb.f90:
        # 1117-1266).
        system, cbw, cfg, ms = g._build(n_water=1, pme_grid=16,
                                        evb_max_states=16, spacing=5.0)
    elif small:
        system, cbw, cfg, ms = g._build(n_water=26, pme_grid=16,
                                        evb_max_states=evb_max_states)
    else:
        system, cbw, cfg, ms = g._build(
            n_water=bench.N_WATER, pme_grid=bench.PME_GRID,
            precision="fp32", evb_max_states=evb_max_states)
        ms, system = bench.load_equilibrated(
            ms, system, cbw, pathlib.Path(bench.__file__).parent
            / "benchdata" / "eq_flagship_s80.npz")

    atoms = umbrella.transfer_triple(ms, system)
    centers = np.linspace(-span, span, n_windows)
    fdt = ms.state.x.dtype
    ladder = (
        umbrella.make_ladder(atoms, centers, k_spring, cv_type=0,
                             dtype=fdt),
        umbrella.make_ladder(atoms, np.full(n_windows, r_oo), k_roo,
                             cv_type=1, dtype=fdt),
    )
    if verbose:
        print(f"# atoms (O_d, O_a, H) = {atoms.tolist()}, "
              f"{n_windows} windows in [{-span}, {span}], "
              f"k = {k_spring}, keeper k_roo = {k_roo} @ {r_oo} A",
              flush=True)

    # Caps past the production 80 switch the per-diabat reciprocal delta
    # to the XLA spectrum matmul: the Pallas kernel's BACKWARD holds ~7
    # live blocks per program, the replica vmap multiplies them by the
    # batch width, and the per-chunk scoped allocations CO-allocate --
    # at S = 112 the ladder exceeds the 16 MB scoped-VMEM limit at
    # compile time for every (chunk, vmap-width) split tried (round 5).
    # The XLA path trades ~15% step time for HBM-resident spectra.
    if system.evb_max_states > 80:
        from reactive_pb_nn_md_tpu.models import pme as _pme
        _pme.set_perstate_impl("xla")
    # max_vmap: optional vmap-group width (groups run sequentially
    # through ONE compiled scan); the chip saturates by ~8-16 replicas
    # of the 649-atom box (R=16 aggregate 389 vs R=64's 357, r3 notes).
    if max_vmap is None:
        max_vmap = n_windows
    scan = umbrella.make_ladder_scan(system, cbw, cfg.delta_t, "NVT",
                                     chunk, friction=friction,
                                     temperature=temperature)
    groups = [slice(g, min(g + max_vmap, n_windows))
              for g in range(0, n_windows, max_vmap)]
    t_compile0 = time.time()
    t_run0 = None
    cvs, batches = [], []
    info = {"hops": 0, "overflow": False, "steps_equil": 0,
            "steps_sampled": 0}
    for gi, sl in enumerate(groups):
        lad_g = jax.tree_util.tree_map(lambda a: a[sl], ladder)
        batch = umbrella.seeded_window_states(
            ms, system, cbw, atoms, centers[sl], r_oo=r_oo,
            temperature=temperature, ladder=lad_g)
        batch, diag = scan(batch, lad_g)   # compile (group 0) + chunk 1
        float(np.asarray(diag.potential)[-1, -1])
        if t_run0 is None:
            t_run0 = time.time()
        batch, cv_g, info_g = umbrella.sample_ladder(
            scan, batch, lad_g, n_equil=max(0, n_equil - chunk),
            n_sample=n_sample, chunk=chunk)
        cvs.append(cv_g)
        batches.append(batch)
        info["hops"] += info_g["hops"]
        info["overflow"] = info["overflow"] or info_g["overflow"]
        info["steps_equil"] = info_g["steps_equil"]
        info["steps_sampled"] = info_g["steps_sampled"]
    cv = np.concatenate(cvs, axis=0)
    batch = batches[-1]
    wall = time.time() - t_run0
    agg = n_windows * (info["steps_equil"] + info["steps_sampled"]) / wall

    res, pmf_std = wham.wham_bootstrap(
        cv, centers, k_spring, temperature, n_boot=20,
        n_bins=max(31, 4 * n_windows + 1))
    barrier, xi_b, lo, hi = wham.barrier_height(res["bin_centers"],
                                                res["pmf"])
    out = {
        "config": {"n_windows": n_windows, "span": span, "k": k_spring,
                   "k_roo": k_roo, "r_oo": r_oo, "n_equil": n_equil,
                   "n_sample": n_sample, "temperature": temperature,
                   "dt_ps": float(cfg.delta_t),
                   "evb_max_states": evb_max_states,
                   "n_atoms": system.n_atoms,
                   "atoms": [int(a) for a in atoms]},
        "centers": centers.tolist(),
        "cv_mean": np.round(cv.mean(axis=1), 4).tolist(),
        "cv_std": np.round(cv.std(axis=1), 4).tolist(),
        "bin_centers": np.round(res["bin_centers"], 4).tolist(),
        "pmf_kjmol": np.round(res["pmf"], 3).tolist(),
        "pmf_std_kjmol": np.round(pmf_std, 3).tolist(),
        "window_f_kjmol": np.round(res["f_i"], 3).tolist(),
        "wham_converged": bool(res["converged"]),
        "barrier_kjmol": None if np.isnan(barrier) else round(barrier, 2),
        "barrier_kT": None if np.isnan(barrier)
        else round(barrier / res["kT"], 2),
        "barrier_xi": None if np.isnan(xi_b) else round(xi_b, 3),
        "hops_in_ladder": info["hops"],
        "overflow": info["overflow"],
        "aggregate_steps_per_s": round(agg, 1),
        "compile_s": round(t_run0 - t_compile0, 1),
        "total_s": round(time.time() - t0, 1),
    }
    return out, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--span", type=float, default=0.65)
    ap.add_argument("--k", type=float, default=400.0)
    ap.add_argument("--k-roo", type=float, default=100.0)
    ap.add_argument("--r-oo", type=float, default=2.5)
    ap.add_argument("--equil", type=int, default=1500)
    ap.add_argument("--sample", type=int, default=6000)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--temperature", type=float, default=300.0)
    ap.add_argument("--states", type=int, default=48)
    ap.add_argument("--small", action="store_true",
                    help="tiny 26-water box (CPU-feasible smoke run)")
    ap.add_argument("--dimer", action="store_true",
                    help="isolated Zundel pair (clean transfer PMF)")
    ap.add_argument("--out", default="benchdata/pmf_flagship.json")
    args = ap.parse_args()

    out, _ = run_pmf(n_windows=args.windows, span=args.span,
                     k_spring=args.k, k_roo=args.k_roo, r_oo=args.r_oo,
                     n_equil=args.equil, n_sample=args.sample,
                     chunk=args.chunk, temperature=args.temperature,
                     evb_max_states=args.states, small=args.small,
                     dimer=args.dimer)
    path = pathlib.Path(args.out)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in
                      ("barrier_kjmol", "barrier_kT", "barrier_xi",
                       "hops_in_ladder", "overflow",
                       "aggregate_steps_per_s", "wham_converged",
                       "total_s")}))
    print(f"# PMF artifact -> {path}")


if __name__ == "__main__":
    main()
