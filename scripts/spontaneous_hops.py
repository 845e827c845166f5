"""Calibrate + demonstrate SPONTANEOUS (unseeded) proton transport.

VERDICT r4 item 3: no artifact showed hops occurring from thermal
fluctuations alone -- the fixture's MS-EVB3 constants put the transfer
barrier at ~24 kT (measured by the round-5 umbrella machinery:
scripts/umbrella_pmf.py on the unsoftened surface).  This script

  --scan   runs an unseeded NVT window for a grid of softening scales
           (presets.soften_for_hops) and prints hops / barrier per
           candidate -- the calibration table for bench.SPONT_SCALES;
  --pmf    adds a short umbrella PMF barrier measurement per candidate;
  --final  runs the pinned scales for a long window and writes the hop
           EVENT artifact (benchdata/spontaneous_hops.json: step, time,
           donor -> acceptor molecule, n_states) -- the hop-file evidence
           (reference hop log, ms_evb.f90:330-336).

Usage:
  python scripts/spontaneous_hops.py --scan [--steps 2048] [--temp 300]
  python scripts/spontaneous_hops.py --final [--steps 20480]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tests"))

CANDIDATES = [
    # (coupling_scale, da_scale, pa_scale, c12_scale)
    (1.0, 1.0, 1.0, 1.0),      # unsoftened control
    (2.0, 0.5, 0.5, 1.0),
    (3.0, 0.4, 0.4, 0.6),
    (4.0, 0.3, 0.3, 0.5),
    (5.0, 0.25, 0.25, 0.4),
]


def _build_softened(scales, temperature, seed=23):
    import jax
    import bench
    from reactive_pb_nn_md_tpu.md import integrators, velocities
    from reactive_pb_nn_md_tpu.run import presets

    system, cbw, cfg, ms = bench._build_flagship(
        "fp32", bench.EVB_MAX_STATES, True)
    cs, das, pas, c12s = scales
    system = presets.soften_for_hops(system, coupling_scale=cs,
                                     da_scale=das, pa_scale=pas,
                                     c12_scale=c12s)
    mobile = velocities.freeze_mask(system, ms.topo)
    v = velocities.sample_velocities(jax.random.PRNGKey(seed), system.mass,
                                     temperature, mobile)
    ms = integrators.initial_md_state(
        ms.state.replace(v=v), ms.topo, system, cbw, ms.nlist.capacity,
        cells=ms.nlist.cells or None, react_cap=ms.nlist.react_cap or None)
    return system, cbw, cfg, ms


def run_window(scales, n_steps, temperature, collect_events=False,
               chunk=128, friction=1.0):
    """Unseeded NVT window; returns stats (+ hop events if requested)."""
    import numpy as np
    import __graft_entry__ as g
    g._enable_compile_cache()
    from reactive_pb_nn_md_tpu.md import integrators

    system, cbw, cfg, ms = _build_softened(scales, temperature)

    def scan(ms):
        return integrators.md_scan(ms, system, cbw, cfg.delta_t, "NVT",
                                   chunk, friction=friction,
                                   temperature=temperature)

    ms, diag = scan(ms)          # compile + thermalization, discarded
    float(diag.potential[-1])
    t0 = time.perf_counter()
    done = 0
    hops = 0
    n_max = 0
    events = []
    identity_ok = True
    n_evb_over = 0
    n_force_over = 0
    while done < n_steps:
        ms, diag = scan(ms)
        hopped = np.asarray(diag.hopped)
        hyds = np.asarray(diag.hydronium)
        ns = np.asarray(diag.n_states)
        if hopped.any() and collect_events:
            prev = np.concatenate([[events[-1]["to_mol"] if events
                                    else hyds[0]], hyds[:-1]])
            for i in np.flatnonzero(hopped):
                events.append({
                    "step": int(done + i + 1),
                    "time_ps": round(float((done + i + 1) * cfg.delta_t),
                                     4),
                    "from_mol": int(prev[i]), "to_mol": int(hyds[i]),
                    "n_states": int(ns[i])})
        hops += int(hopped.sum())
        n_max = max(n_max, int(ns.max()))
        done += chunk
        n_evb_over += int(np.asarray(diag.evb_overflow).sum())
        n_force_over += int(np.asarray(diag.force_overflow).sum())
        if n_evb_over or n_force_over:
            identity_ok = False
    dt = time.perf_counter() - t0
    out = {"scales": list(scales), "temperature": temperature,
           "steps": done, "window_ps": round(done * cfg.delta_t, 2),
           "hops": hops, "max_states": n_max,
           "steps_per_s": round(done / dt, 1),
           "clean": identity_ok,
           # attribution: steps with a truncated state set vs steps with
           # a transient |F| > 1e4 kJ/mol/A (the reference's abort
           # threshold, md_integration.f90:523-526 -- strained mid-hop
           # geometries can brush it without going non-finite)
           "steps_evb_overflow": n_evb_over,
           "steps_force_over_1e4": n_force_over}
    if collect_events:
        out["events"] = events
    return out


def run_barrier(scales, temperature=300.0):
    """Short umbrella PMF barrier for one softening candidate."""
    import umbrella_pmf  # noqa: F401  (same scripts dir)
    build = _build_softened(scales, temperature)[:4]
    out, _ = umbrella_pmf.run_pmf(n_windows=12, span=0.6, k_spring=400.0,
                                  n_equil=300, n_sample=1000, chunk=100,
                                  build=build, verbose=False)
    return out["barrier_kjmol"], out["barrier_kT"], out["hops_in_ladder"]


def main():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", action="store_true")
    ap.add_argument("--pmf", action="store_true")
    ap.add_argument("--final", action="store_true")
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--temp", type=float, default=300.0)
    ap.add_argument("--scales", type=float, nargs=4, default=None,
                    help="coupling da pa c12 (overrides the grid)")
    ap.add_argument("--out", default="benchdata/spontaneous_hops.json")
    args = ap.parse_args()

    if args.scan:
        grid = [tuple(args.scales)] if args.scales else CANDIDATES
        for sc in grid:
            r = run_window(sc, args.steps, args.temp)
            line = (f"scales={sc} T={args.temp:.0f} "
                    f"hops={r['hops']} / {r['window_ps']} ps "
                    f"max_states={r['max_states']} "
                    f"steps/s={r['steps_per_s']} clean={r['clean']}")
            if args.pmf:
                b_kj, b_kt, lh = run_barrier(sc, args.temp)
                line += f"  barrier={b_kj} kJ/mol ({b_kt} kT)"
            print(line, flush=True)
        return

    if args.final:
        import numpy as np
        import bench
        sc = tuple(args.scales) if args.scales else tuple(
            bench.SPONT_SCALES[k] for k in
            ("coupling_scale", "da_scale", "pa_scale", "c12_scale"))
        r = run_window(sc, args.steps, args.temp, collect_events=True)
        ev = r["events"]
        if ev:
            mols = ({e["to_mol"] for e in ev}
                    | {e["from_mol"] for e in ev})
            gaps = np.diff([e["time_ps"] for e in ev])
            r["distinct_molecules_visited"] = len(mols)
            r["mean_identity_survival_ps"] = (round(float(gaps.mean()), 5)
                                              if gaps.size else None)
            r["hops_per_ps"] = round(len(ev) / r["window_ps"], 2)
        path = pathlib.Path(args.out)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(r, indent=1))
        print(json.dumps({k: v for k, v in r.items() if k != "events"}))
        print(f"# hop-event artifact -> {path} "
              f"({len(r['events'])} events)")
        return

    ap.print_help()


if __name__ == "__main__":
    main()
