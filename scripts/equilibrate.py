"""Equilibrate a preset configuration and save (state, topology) for the
benchmarks (the drift-study protocol, generalized): rescaled-NVE chunks
to the target temperature, overflow flags tolerated for the EVB cap only
(transient warm-up truncation), saved as an npz of pytree leaves that
bench.py re-loads onto a fresh build of the same preset.

Usage:
    python scripts/equilibrate.py flagship 4000 benchdata/eq_flagship_s80.npz
    python scripts/equilibrate.py acid     4000 benchdata/eq_acid_s80.npz
    python scripts/equilibrate.py acid5k   3000 benchdata/eq_acid5k.npz
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def build(config):
    import __graft_entry__ as g
    g._enable_compile_cache()
    from reactive_pb_nn_md_tpu.run import presets
    if config == "flagship":
        return g._build(n_water=215, pme_grid=32, precision="fp32",
                        evb_max_states=80)
    if config == "acid":
        return presets.build_acid_system(n_water=215, pme_grid=32,
                                         evb_max_states=80)
    if config == "acid5k":
        # 1 so3h + 23 so3- + 1627 waters = 5002 atoms, cell-list regime
        return presets.build_acid_system(n_water=1627, n_so3=23,
                                         pme_grid=64, evb_max_states=80)
    raise SystemExit(f"unknown config {config!r}")


def main():
    config = sys.argv[1]
    equil_steps = int(sys.argv[2])
    out = sys.argv[3]

    import numpy as np
    import jax
    import jax.numpy as jnp
    system, cbw, cfg, ms = build(config)
    from reactive_pb_nn_md_tpu.md import integrators, velocities as vel
    from reactive_pb_nn_md_tpu.utils.constants import KB

    mobile = vel.freeze_mask(system, ms.topo)
    ndof = 3 * int(np.sum(np.asarray(mobile))) - 3
    ke_target = 0.5 * ndof * KB * 300.0

    chunk = 40
    t0 = time.time()

    # quench phase: lattice starts can have contacts past the 1e4
    # force-abort threshold (tight acid neighborhoods, compressed water
    # sites).  Staged small-dt NVE with velocities re-zeroed per chunk is
    # a damped relaxation; dt is a traced scalar so no recompile.
    zeros = ms.state.v * 0.0
    for div in (40, 20, 10, 5):
        for q in range(8):
            ms, diag = integrators.md_scan(
                ms, system, cbw, cfg.delta_t / div, "NVE", chunk)
            ms = ms.replace(state=ms.state.replace(v=zeros))
            if np.asarray(diag.nbr_overflow).any():
                raise SystemExit(f"quench neighbor overflow at dt/{div}")
    print(f"# quenched {4 * 8 * chunk} staged-dt steps, "
          f"{time.time()-t0:.0f} s", flush=True)
    ms = ms.replace(state=ms.state.replace(
        v=vel.sample_velocities(jax.random.PRNGKey(1), system.mass, 50.0,
                                mobile)))

    done = 0
    while done < equil_steps:
        ms, diag = integrators.md_scan(ms, system, cbw, cfg.delta_t,
                                       "NVE", chunk)
        done += chunk
        heating = done < equil_steps // 2
        if np.asarray(diag.nbr_overflow).any():
            raise SystemExit(f"equilibration neighbor overflow at {done}")
        if np.asarray(diag.force_overflow).any():
            f = np.asarray(ms.force)
            fmag = np.linalg.norm(f, axis=1)
            a = int(np.argmax(fmag))
            t = int(np.asarray(ms.topo.atom_type)[a])
            tname = system.ff.atype_names[t] \
                if t < len(system.ff.atype_names) else "?"
            info = (f"atom {a} type {tname} |F|={fmag[a]:.0f} "
                    f"mol {int(np.asarray(ms.topo.atom_mol)[a])}")
            # tolerated during equilibration: single-step spikes during
            # the lattice melt self-heal (chunk-end max |F| is back to
            # O(10^2-10^3)); the clean validation window below is the
            # actual gate on the saved state
            print(f"# transient force spike at {done}"
                  f"{' (heating)' if heating else ''}: {info}", flush=True)
        if np.asarray(diag.evb_overflow).any():
            print(f"# transient EVB-cap overflow at {done} (warm-up only)",
                  flush=True)
        ke = float(np.asarray(diag.kinetic)[-1])
        if not np.isfinite(ke):
            raise SystemExit(f"non-finite KE at {done}")
        # temperature ramp: 50 K -> 300 K over the heating half
        frac = min(1.0, done / max(1, equil_steps // 2))
        kt = ke_target * (50.0 + 250.0 * frac) / 300.0
        scale = jnp.asarray(np.sqrt(kt / ke), ms.state.v.dtype)
        ms = ms.replace(state=ms.state.replace(v=ms.state.v * scale))
        if done % 1000 == 0:
            print(f"# {done}/{equil_steps}, {time.time()-t0:.0f} s, "
                  f"KE {ke:.0f} -> {kt:.0f}, "
                  f"n_states max {int(np.asarray(diag.n_states).max())}",
                  flush=True)

    # validation window: plain NVE, every flag fatal -- the state is only
    # saved if it runs clean (this is what the bench will assert too)
    for _ in range(10):
        ms, diag = integrators.md_scan(ms, system, cbw, cfg.delta_t,
                                       "NVE", chunk)
        bad = [n for n in ("nbr_overflow", "force_overflow",
                           "evb_overflow")
               if np.asarray(getattr(diag, n)).any()]
        if bad or not np.isfinite(float(np.asarray(diag.potential)[-1])):
            raise SystemExit(f"validation window failed: {bad}")
    print(f"# validation window clean (400 steps, no flags)", flush=True)

    leaves = jax.tree_util.tree_leaves((ms.state, ms.topo))
    np.savez(out, **{f"l{i}": np.asarray(v) for i, v in enumerate(leaves)})
    print(f"# saved {config} after {done} steps -> {out}")


if __name__ == "__main__":
    main()
