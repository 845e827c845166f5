"""Measure max real-space cell occupancy over an MD window.

Decides how tight the fused pair kernel's static ccap
(ops/pallas/realspace_pair.suggest_rs_cells) can be: padding multiplies
the kernel's candidate math directly (J = 14*ccap lanes per program), and
liquid-water density fluctuations are strongly sub-Poissonian
(sigma^2/N = rho kT kappa_T ~= 0.2), so the 4-sigma-Poisson default is
far looser than the physics requires.  Overflow regrow protects
correctness either way; this measures the real tail.

Usage: python scripts/cell_occupancy.py [n_water] [pme_grid] [steps]
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import __graft_entry__ as g
    g._enable_compile_cache()
    from reactive_pb_nn_md_tpu.md import integrators

    n_water = int(sys.argv[1]) if len(sys.argv) > 1 else 3332
    pme_grid = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    system, cbw, cfg, ms = g._build(n_water=n_water, pme_grid=pme_grid,
                                    precision="fp32", evb_max_states=32)
    cells = system.rs_cells
    K = pme_grid
    print(f"rs_cells = {cells}  pme_scap = {system.pme_scap}")
    nc1, nc2, nc3, ccap = cells
    ncv = jnp.array([nc1, nc2, nc3], jnp.int32)

    @jax.jit
    def max_occ(x, box):
        L = jnp.diagonal(box)
        frac = x / L[None, :]
        frac = frac - jnp.floor(frac)
        ci = jnp.clip((frac * ncv).astype(jnp.int32), 0, ncv - 1)
        cell_id = (ci[:, 0] * nc2 + ci[:, 1]) * nc3 + ci[:, 2]
        counts = jnp.zeros((nc1 * nc2 * nc3,), jnp.int32).at[cell_id].add(1)
        # PME slab occupancy: atoms binned by x-corner c1 = floor(u1)
        u1 = pbc_scaled(x, box, K)
        sl = jnp.zeros((K,), jnp.int32).at[u1].add(1)
        return jnp.max(counts), jnp.max(sl)

    from reactive_pb_nn_md_tpu.utils import pbc as _pbc

    def pbc_scaled(x, box, K):
        u = _pbc.scaled_grid_coords(x, box, K)
        return jnp.clip(jnp.floor(u[:, 0]).astype(jnp.int32), 0, K - 1)

    chunk = 64      # matches bench.py's 10k scan length (compile cache)
    occs, slabs = [], []
    for i in range(steps // chunk):
        ms, diag = integrators.md_scan(ms, system, cbw, cfg.delta_t,
                                       "NVE", chunk)
        mo, so = max_occ(ms.state.x, ms.state.box)
        occs.append(int(mo))
        slabs.append(int(so))
        if i % 2 == 1:
            print(f"step {(i + 1) * chunk}: cell max = {max(occs)} "
                  f"slab max = {max(slabs)}", flush=True)
    occs, slabs = np.array(occs), np.array(slabs)
    n_atoms = n_water * 3 + 4
    mean = n_atoms / (nc1 * nc2 * nc3)
    print(f"cell mean {mean:.2f} max {occs.max()} "
          f"(median {np.median(occs):.0f}) ccap {ccap}; "
          f"slab mean {n_atoms / K:.1f} max {slabs.max()} "
          f"(median {np.median(slabs):.0f}) scap {system.pme_scap} "
          f"over {steps} steps")


if __name__ == "__main__":
    main()
