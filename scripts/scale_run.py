"""Large-system scale probe: reactive MS-EVB steps/s at arbitrary N.

Usage:  python scripts/scale_run.py [n_water] [pme_grid] [chunk] [steps]

Builds the same water+hydronium deck as bench.py at the requested size
(100k atoms: n_water=33332, pme_grid=128) and times scanned chunks on the
current device.  Reports wall ms/step, steps/s, and the overflow flags --
a capacity overflow at scale means the density heuristics (cell ccap, PME
slab cap, EVB adjacency rows) need regrowing, which the production driver
does automatically; this probe reports instead of regrowing.
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def main():
    n_water = int(sys.argv[1]) if len(sys.argv) > 1 else 33332
    pme_grid = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    import __graft_entry__ as g
    g._enable_compile_cache()
    from reactive_pb_nn_md_tpu.md import integrators

    t0 = time.time()
    system, cbw, cfg, ms = g._build(n_water=n_water, pme_grid=pme_grid,
                                    precision="fp32", evb_max_states=32)
    if "--no-rs-kernel" in sys.argv:
        # at ~10^5 atoms the fused pair kernel's resident cell blocks
        # exceed scoped VMEM (measured: 41.7M vs the 16M limit at 22^3
        # cells); fall back to the XLA half-list path, which is
        # capacity-bound in HBM instead
        system = system.replace(rs_cells=())
        ms = integrators.initial_md_state(ms.state, ms.topo, system, cbw,
                                          ms.nlist.capacity,
                                          cells=ms.nlist.cells or None,
                                          react_cap=ms.nlist.react_cap
                                          or None)
    print(f"build: {system.n_atoms} atoms, {system.n_mole} molecules, "
          f"PME {system.pme_grid}^3, rs_cells {system.rs_cells}, "
          f"pme_scap {system.pme_scap}, {time.time() - t0:.1f} s",
          flush=True)

    def scan(ms):
        return integrators.md_scan(ms, system, cbw, cfg.delta_t, "NVE",
                                   chunk)

    t0 = time.time()
    ms, diag = scan(ms)
    pot = float(diag.potential[-1])
    print(f"first chunk (compile): {time.time() - t0:.1f} s, "
          f"potential {pot:.1f}", flush=True)
    flags = dict(nbr=bool(diag.nbr_overflow.any()),
                 evb=bool(diag.evb_overflow.any()),
                 force=bool(diag.force_overflow.any()))
    print(f"overflow flags after warmup: {flags}", flush=True)

    t0 = time.time()
    done = 0
    while done < steps:
        ms, diag = scan(ms)
        done += chunk
    pot = float(diag.potential[-1])
    dt = time.time() - t0
    print(f"{done} steps in {dt:.2f} s = {done / dt:.2f} steps/s "
          f"({1000.0 * dt / done:.1f} ms/step), potential {pot:.1f}, "
          f"diabats {int(diag.n_states[-1])}", flush=True)
    flags = dict(nbr=bool(diag.nbr_overflow.any()),
                 evb=bool(diag.evb_overflow.any()),
                 force=bool(diag.force_overflow.any()))
    print(f"overflow flags: {flags}", flush=True)


if __name__ == "__main__":
    main()
