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

    def regrow(ms_prev, factor=1.4):
        """Driver-style neighbor regrow + replay: the overflow flag is
        shared by the half list, full/react adjacencies, cell buckets,
        the fused pair kernel's cell capacity and the PME slab capacity
        (md/simulation._retry_capacity_if_overflow) -- grow them ALL and
        rebuild from the pre-chunk state (an overflowed chunk ran with a
        truncated list; discard it)."""
        nonlocal system
        nl = ms_prev.nlist
        new_cap = int(nl.capacity * factor) + 8
        new_rcap = (int(nl.react_cap * factor) + 8) if nl.react_cap else None
        cells = nl.cells or None
        if cells:
            n1, n2, n3, ccap = cells
            cells = (n1, n2, n3, int(ccap * 1.5) + 4)
        react_cells = getattr(nl, "react_cells", None) or None
        if react_cells:
            rn1, rn2, rn3, rcc = react_cells
            react_cells = (rn1, rn2, rn3, int(rcc * 1.5) + 4)
        if system.rs_cells:
            n1, n2, n3, rcap = system.rs_cells
            system = system.replace(
                rs_cells=(n1, n2, n3, -(-int(rcap * 1.3 + 8) // 8) * 8))
        if system.pme_scap:
            # multiplicative: lattice melts concentrate planes into slabs
            system = system.replace(
                pme_scap=-(-int(system.pme_scap * 1.3 + 16) // 8) * 8)
        print(f"# neighbor regrow: capacity {nl.capacity} -> {new_cap}, "
              f"cells {nl.cells} -> {cells}, rs_cells {system.rs_cells}, "
              f"scap {system.pme_scap}", flush=True)
        return integrators.initial_md_state(
            ms_prev.state, ms_prev.topo, system, cbw, new_cap,
            cells=cells, react_cap=new_rcap, react_cells=react_cells)

    # quench phase: lattice starts can have contacts past the 1e4
    # force-abort threshold (tight acid neighborhoods, compressed water
    # sites).  Staged small-dt NVE with velocities REDRAWN at 50 K per
    # chunk dissipates the contact energy while keeping thermal pressure
    # (a zero-velocity quench cold-collapsed the charged acid5k box into
    # clusters: neighbor capacity regrew 91 -> 404 and climbing); dt is a
    # traced scalar so no recompile.
    for qi, div in enumerate((40, 20, 10, 5)):
        q = 0
        while q < 8:
            prev = ms
            ms, diag = integrators.md_scan(
                ms, system, cbw, cfg.delta_t / div, "NVE", chunk)
            if np.asarray(diag.nbr_overflow).any():
                ms = regrow(prev)
                continue
            ms = ms.replace(state=ms.state.replace(
                v=vel.sample_velocities(jax.random.PRNGKey(100 + 8 * qi + q),
                                        system.mass, 50.0, mobile)))
            q += 1
    print(f"# quenched {4 * 8 * chunk} staged-dt steps, "
          f"{time.time()-t0:.0f} s", flush=True)

    done = 0
    while done < equil_steps:
        prev = ms
        ms, diag = integrators.md_scan(ms, system, cbw, cfg.delta_t,
                                       "NVE", chunk)
        done += chunk
        heating = done < equil_steps // 2
        if np.asarray(diag.nbr_overflow).any():
            ms = regrow(prev)
            done -= chunk
            continue
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

    # re-tighten capacities to the fresh density estimates: the melt
    # phase may have regrown them to transient-lattice sizes (padded
    # capacity is paid on every production step), and the equilibrated
    # liquid usually fits the original suggestions.  The validation
    # window below regrows again if it does not.
    fresh_system, _, _, fresh_ms = build(config)
    system = fresh_system
    ms = integrators.initial_md_state(
        ms.state, ms.topo, system, cbw, fresh_ms.nlist.capacity,
        cells=fresh_ms.nlist.cells or None,
        react_cap=fresh_ms.nlist.react_cap or None,
        react_cells=fresh_ms.nlist.react_cells or None)

    # validation window: plain NVE with regrow-and-replay; any
    # non-capacity flag is fatal and the state is only saved if the
    # final pass runs clean (this is what the bench will assert too)
    clean = 0
    while clean < 10:
        prev = ms
        ms, diag = integrators.md_scan(ms, system, cbw, cfg.delta_t,
                                       "NVE", chunk)
        if np.asarray(diag.nbr_overflow).any():
            ms = regrow(prev)
            clean = 0
            continue
        bad = [n for n in ("force_overflow", "evb_overflow")
               if np.asarray(getattr(diag, n)).any()]
        if bad or not np.isfinite(float(np.asarray(diag.potential)[-1])):
            raise SystemExit(f"validation window failed: {bad}")
        clean += 1
    print(f"# validation window clean (400 steps, no flags)", flush=True)

    leaves = jax.tree_util.tree_leaves((ms.state, ms.topo))
    payload = {f"l{i}": np.asarray(v) for i, v in enumerate(leaves)}
    # persist the (possibly regrown) static capacities so loaders rebuild
    # the neighbor state at sizes that actually hold this configuration
    nl = ms.nlist
    payload["meta_capacity"] = np.asarray(nl.capacity)
    payload["meta_cells"] = np.asarray(nl.cells or (), np.int64)
    payload["meta_react_cap"] = np.asarray(nl.react_cap or 0)
    payload["meta_react_cells"] = np.asarray(nl.react_cells or (), np.int64)
    payload["meta_rs_cells"] = np.asarray(system.rs_cells or (), np.int64)
    payload["meta_pme_scap"] = np.asarray(system.pme_scap)
    np.savez(out, **payload)
    print(f"# saved {config} after {done} steps -> {out}")


if __name__ == "__main__":
    main()
