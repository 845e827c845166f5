"""Phase decomposition of the reactive MD step on the current device.

The jitted step is one program, so this times separately-jitted sub-phases
(each end-to-end with its own dispatch) -- an upper bound per phase, but it
ranks the optimization targets.  Usage:
    python scripts/profile_step.py [n_water] [pme_grid] [evb_max_states]
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def timeit(fn, *args, n=20):
    import jax
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    n_water = int(sys.argv[1]) if len(sys.argv) > 1 else 215
    pme_grid = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    smax = int(sys.argv[3]) if len(sys.argv) > 3 else 80

    import __graft_entry__ as g
    import tempfile
    # patch evb_max_states through the sim file knob
    from reactive_pb_nn_md_tpu.io import simpmt
    orig = simpmt.read_sim_params

    def patched(path):
        cfg = orig(path)
        cfg.evb_max_states = smax
        return cfg
    simpmt.read_sim_params = patched

    system, cbw, cfg, ms = g._build(n_water=n_water, pme_grid=pme_grid,
                                    precision="fp32")
    simpmt.read_sim_params = orig

    from reactive_pb_nn_md_tpu.md import integrators
    from reactive_pb_nn_md_tpu.ops import neighbors
    from reactive_pb_nn_md_tpu.evb import hamiltonian as ham
    from reactive_pb_nn_md_tpu.evb.enumerate import enumerate_diabats
    from reactive_pb_nn_md_tpu.evb.topology_ops import build_diabat_topologies
    from reactive_pb_nn_md_tpu.models import total as T, pme

    x, box, topo = ms.state.x, ms.state.box, ms.topo
    pairs = neighbors.neighbor_pairs(ms.nlist)

    print(f"# n_atoms={system.n_atoms} S={system.evb_max_states} "
          f"K={pme_grid} device={jax.devices()[0]}")

    full = jax.jit(lambda m: integrators.md_step.__wrapped__(
        m, system, cbw, cfg.delta_t, "NVE"))
    print(f"full md_step          : {timeit(full, ms):8.2f} ms")

    enum = jax.jit(lambda x: enumerate_diabats(x, box, topo, system))
    print(f"enumerate             : {timeit(enum, x):8.2f} ms")
    dset = enum(x)

    build = jax.jit(lambda d: build_diabat_topologies(topo, d, system))
    print(f"build topologies      : {timeit(build, dset):8.2f} ms")
    batch = build(dset)

    full_idx = ms.nlist.full_idx
    diagf = jax.jit(lambda xx: ham.diabat_diagonal_energies(
        xx, box, batch, system, pairs, cbw, topo.charge, topo, full_idx)[0])
    print(f"diag energies (fwd)   : {timeit(diagf, x):8.2f} ms")

    diagg = jax.jit(jax.grad(lambda xx: ham.diabat_diagonal_energies(
        xx, box, batch, system, pairs, cbw, topo.charge, topo,
        full_idx)[0].sum()))
    print(f"diag energies (f+bwd) : {timeit(diagg, x):8.2f} ms")

    from reactive_pb_nn_md_tpu.evb.enumerate import molecule_com
    cpl = jax.jit(lambda xx: ham.coupling_elements(
        xx, box, batch, system, molecule_com(xx, topo, system.mass, box)))
    print(f"couplings (fwd)       : {timeit(cpl, x):8.2f} ms")

    base = jax.jit(lambda xx: T.total_energy(
        xx, box, topo, system, pairs, cbw).total)
    print(f"single total (fwd)    : {timeit(base, x):8.2f} ms")

    nl = jax.jit(lambda xx: neighbors.build_neighbor_list(
        xx, box, system.verlet_cutoff, ms.nlist.capacity))
    print(f"neighbor rebuild      : {timeit(nl, x):8.2f} ms")

    eig = jax.jit(lambda H: jnp.linalg.eigh(H))
    import numpy as np
    H = jnp.asarray(np.eye(system.evb_max_states, dtype=np.float32))
    print(f"eigh {system.evb_max_states}x{system.evb_max_states}          "
          f": {timeit(eig, H):8.2f} ms")


if __name__ == "__main__":
    main()


def scan_probe():
    """Append-mode probe: time md_scan chunks to separate dispatch overhead
    from real per-step compute."""
    import jax
    import __graft_entry__ as g
    from reactive_pb_nn_md_tpu.md import integrators
    system, cbw, cfg, ms = g._build(n_water=215, pme_grid=32,
                                    precision="fp32")
    for n in (1, 5, 20):
        fn = lambda m: integrators.md_scan(m, system, cbw, cfg.delta_t,
                                           "NVE", n)
        t = timeit(fn, ms, n=5)
        print(f"md_scan({n:3d} steps)    : {t:8.2f} ms total, "
              f"{t / n:7.2f} ms/step")
