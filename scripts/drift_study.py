"""NVE drift decomposition (VERDICT r1 item 5): the same flagship
trajectory in three configurations -- fp32 TPU, fp32 CPU, fp64 CPU --
non-reactive and reactive, to separate fp32 rounding drift from
sharp-cutoff truncation drift (identical physics in all three; only
arithmetic differs).

Usage:
    python scripts/drift_study.py tpu-fp32 [steps] [reactive|nonreactive] [equil_steps]
    python scripts/drift_study.py cpu-fp32 [steps] [...]
    python scripts/drift_study.py cpu-fp64 [steps] [...]
    python scripts/drift_study.py tpu-fp32-comp [...]   (Kahan-compensated
        integrator carries: fp32 state/forces, ~fp64 accumulation)

Optional 5th/6th args share one equilibrated state across configs so
every arithmetic runs the SAME initial condition (the decomposition is
then purely arithmetic, not equilibration luck):
    ... [equil_steps] save=eq.npz     equilibrate, save (state+topology), exit
    ... 0             load=eq.npz     skip equil, measure from the saved state

The measurement window is preceded by `equil_steps` (default 4000 = 2 ps)
of NVE with per-chunk velocity rescaling to 300 K (host-side, reusing the
cached NVE program -- a Langevin leg would cost a second 25-min remote
compile): the fixture box starts from a lattice-ish configuration, and
NVE "drift" on a relaxing configuration conflates equilibration with
integrator/arithmetic error.  Overflow flags
(neighbor capacity, EVB state cap, force abort) are checked every chunk
-- the production driver regrows/aborts on these; a drift number from a
silently-overflowed trajectory is meaningless.

Prints one line:  <config> <mode> steps=N dt_ps=... E0=... E1=...
drift_per_ps=... drift_pct_of_KE_per_ps=...
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def _save_state(path, ms):
    """Dump (state, topo) pytree leaves; structure is reconstructed by a
    fresh build of the same fixture, so only the arrays need saving."""
    import jax
    import numpy as np
    leaves = jax.tree_util.tree_leaves((ms.state, ms.topo))
    np.savez(path, **{f"l{i}": np.asarray(v) for i, v in enumerate(leaves)})


def _load_state(path, ms):
    """Replace (state, topo) leaves with the saved ones, cast to the
    fresh build's dtypes (fp32 equil state upcasts into an fp64 run)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten((ms.state, ms.topo))
    assert len(leaves) == len(data.files), (len(leaves), len(data.files))
    # jnp leaves, not numpy: the vmapped enumeration indexes topology
    # tables with tracers, which numpy arrays reject in eager mode
    new = [jnp.asarray(np.asarray(data[f"l{i}"]).astype(
               np.asarray(l).dtype))
           for i, l in enumerate(leaves)]
    state, topo = jax.tree_util.tree_unflatten(treedef, new)
    return ms.replace(state=state, topo=topo)


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "tpu-fp32"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    mode = sys.argv[3] if len(sys.argv) > 3 else "nonreactive"
    equil_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 4000
    save_path = load_path = None
    smax = 32
    for extra in sys.argv[5:]:
        if extra.startswith("save="):
            save_path = extra[5:]
        elif extra.startswith("load="):
            load_path = extra[5:]
        elif extra.startswith("smax="):
            # the hot equilibration phase transiently visits more diabats
            # than the equilibrium ~20 (the S=32 cap overflowed at step
            # 182 on the lattice-ish fixture); the production driver
            # regrows, this study just runs with headroom
            smax = int(extra[5:])

    import jax
    if config.startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    # "-comp" suffix: Kahan-compensated integrator carries at fp32
    compensated = config.endswith("-comp")
    base = config[:-5] if compensated else config
    precision = "fp64" if base.endswith("fp64") else "fp32"

    import numpy as np
    import __graft_entry__ as g
    g._enable_compile_cache()

    # flagship box; the non-reactive variant runs the same coordinates
    # with ms_evb off (pure water + spectator hydronium physics differs,
    # so non-reactive uses a pure water box of the same size)
    if mode == "reactive":
        system, cbw, cfg, ms = g._build(n_water=215, pme_grid=32,
                                        precision=precision,
                                        evb_max_states=smax,
                                        compensated=compensated)
    else:
        import tempfile
        import jax.numpy as jnp
        from fixtures import make_water_box, write_fixture_files
        from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
        from reactive_pb_nn_md_tpu.io.topfile import read_top
        from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
        from reactive_pb_nn_md_tpu.topology import build_system, State
        from reactive_pb_nn_md_tpu.models import pme
        from reactive_pb_nn_md_tpu.ops import neighbors
        from reactive_pb_nn_md_tpu.md import integrators, velocities
        from reactive_pb_nn_md_tpu.utils.dtypes import default_float
        tmp = pathlib.Path(tempfile.mkdtemp())
        ff_p, top_p, sim_p = write_fixture_files(
            tmp, msevb="no", cutoff=4.5, verlet_cutoff=5.5, alpha=0.7,
            pme_grid=32)
        sim_txt = (tmp / "sim.pmt").read_text().replace("fp64", precision)
        if compensated:
            sim_txt += "compensated_sum   yes\n"
        (tmp / "sim.pmt").write_text(sim_txt)
        frame = make_water_box(216, include_h3o=False, seed=0)
        cfg = read_sim_params(sim_p)
        system, topo = build_system(frame, read_ffpmt(ff_p),
                                    read_top(top_p), cfg)
        fdt = default_float()
        key = jax.random.PRNGKey(0)
        key, vkey = jax.random.split(key)
        mobile = velocities.freeze_mask(system, topo)
        v = velocities.sample_velocities(vkey, system.mass, 300.0, mobile)
        state = State(x=jnp.asarray(frame.xyz, fdt), v=v,
                      box=jnp.asarray(frame.box, fdt), key=key,
                      step=jnp.asarray(0, jnp.int32))
        cbw = pme.cb_half(state.box, system.pme_grid, system.spline_order,
                          system.alpha_sqrt, dtype=fdt)
        cap = neighbors.suggest_capacity(
            system.n_atoms, float(np.prod(np.diag(frame.box))),
            system.verlet_cutoff)
        ms = integrators.initial_md_state(state, topo, system, cbw, cap)

    from reactive_pb_nn_md_tpu.md import integrators

    if load_path:
        ms = _load_state(load_path, ms)
        # the fresh build's neighbor list and forces refer to the fixture
        # lattice, not the loaded configuration: rebuild from scratch at
        # the same static capacities
        ms = integrators.initial_md_state(
            ms.state, ms.topo, system, cbw, ms.nlist.capacity,
            cells=ms.nlist.cells or None,
            react_cap=ms.nlist.react_cap or None)
        print(f"# loaded equilibrated state from {load_path}", flush=True)

    chunk = 40       # matches the bench scan length (compile-cache hit)

    def flags(diag, done):
        bad = []
        for name in ("nbr_overflow", "evb_overflow", "force_overflow"):
            a = np.asarray(getattr(diag, name))
            if a.any():
                bad.append(f"{name}@{done - chunk + int(np.argmax(a)) + 1}")
        return bad

    from reactive_pb_nn_md_tpu.md import velocities as vel
    from reactive_pb_nn_md_tpu.utils.constants import KB
    import jax.numpy as jnp
    mobile = vel.freeze_mask(system, ms.topo)
    ndof = 3 * int(np.sum(np.asarray(mobile))) - 3
    ke_target = 0.5 * ndof * KB * 300.0

    t0 = time.time()
    done = 0
    while done < equil_steps:
        ms, diag = integrators.md_scan(ms, system, cbw, cfg.delta_t,
                                       "NVE", chunk)
        done += chunk
        bad = flags(diag, done)
        # a transient EVB state-cap overflow during the WARM-UP only
        # truncates the state set for a few steps of thermalization; the
        # measured window below still enforces every flag.  Neighbor or
        # force overflow invalidates even the warm-up.
        if any(b.startswith("evb_overflow") for b in bad):
            print(f"# equil: transient {bad} (tolerated in warm-up)",
                  flush=True)
            bad = [b for b in bad if not b.startswith("evb_overflow")]
        if bad:
            print(f"# EQUIL OVERFLOW {bad} -- aborting", flush=True)
            return
        ke = float(np.asarray(diag.kinetic)[-1])
        scale = jnp.asarray(np.sqrt(ke_target / ke), ms.state.v.dtype)
        ms = ms.replace(state=ms.state.replace(v=ms.state.v * scale))
    if equil_steps:
        print(f"# equilibrated {done} rescaled-NVE steps, "
              f"{time.time() - t0:.0f} s, KE={ke:.1f} -> {ke_target:.1f}",
              flush=True)
    if save_path:
        _save_state(save_path, ms)
        print(f"# saved equilibrated state to {save_path}", flush=True)
        return

    etots = []
    max_states = 0
    t0 = time.time()
    done = 0
    while done < n_steps:
        ms, diag = integrators.md_scan(ms, system, cbw, cfg.delta_t,
                                       "NVE", chunk)
        e = np.asarray(diag.potential) + np.asarray(diag.kinetic)
        etots.append(e)
        max_states = max(max_states, int(np.asarray(diag.n_states).max()))
        done += chunk
        bad = flags(diag, done)
        if bad or not np.isfinite(e[-1]):
            print(f"# ABORT at step {done}: flags={bad} Etot={e[-1]}",
                  flush=True)
            break
        if done % 4000 == 0:
            print(f"# {done}/{n_steps} steps, {time.time() - t0:.0f} s, "
                  f"Etot={e[-1]:.3f}", flush=True)
    e = np.concatenate(etots)
    n_steps = len(e)
    t_ps = np.arange(1, len(e) + 1) * cfg.delta_t
    # robust drift: linear fit over the whole run
    slope = np.polyfit(t_ps, e, 1)[0]
    ke = float(np.asarray(diag.kinetic)[-1])
    print(f"{config} {mode} steps={n_steps} dt_ps={cfg.delta_t} "
          f"E0={e[0]:.4f} E1={e[-1]:.4f} KE={ke:.1f} "
          f"max_states={max_states} "
          f"drift_per_ps={slope:.4f} "
          f"drift_pct_of_KE_per_ps={100.0 * slope / ke:.4f}")


if __name__ == "__main__":
    main()
