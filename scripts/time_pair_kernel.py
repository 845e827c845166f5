"""Decompose the fused real-space pair kernel's cost at the 10k-atom config.

The kernel runs ~1.7 us/program at 10^4 atoms (1000 cells) while its VPU
candidate math only accounts for ~0.2 us/program -- this harness isolates
WHERE the rest goes, by timing ablated variants with the same grid and
block shapes:

  full      : the production half-stencil kernel, fwd and fwd+grad
  noload    : pair math against the self cell only (no stencil DMAs)
  loadonly  : stencil loads + trivial math (no erfc/LJ/one-hot)
  nojside   : half math but no per-offset j-side outputs (forces wrong --
              timing only)

Run ON TPU:  python scripts/time_pair_kernel.py [n_atoms]
"""

import functools
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))

import numpy as np


def timeit(fn, *args, n=20):
    r = fn(*args)
    jax_block(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax_block(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def jax_block(tree):
    import jax
    leaves = jax.tree_util.tree_leaves(tree)
    # value fetch (block_until_ready is async-leaky on this stack)
    float(np.asarray(leaves[0]).ravel()[0])


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    g._enable_compile_cache()
    from reactive_pb_nn_md_tpu.ops.pallas import realspace_pair as rp

    n_water = int(sys.argv[1]) if len(sys.argv) > 1 else 3332
    system, cbw, cfg, ms = g._build(n_water=n_water, pme_grid=64,
                                    precision="fp32", evb_max_states=32)
    x = ms.state.x
    box = ms.state.box
    topo = ms.topo
    f = x.dtype
    cells = system.rs_cells
    print(f"n_atoms={system.n_atoms} cells={cells} "
          f"n_cells={cells[0]*cells[1]*cells[2]}")

    tabs = rp._build_tabs(system, f)
    charge = topo.charge.astype(f)
    atype = topo.atom_type.astype(f)
    mol = topo.atom_mol.astype(f)
    consts = (float(system.real_space_cutoff), float(system.alpha_sqrt),
              bool(system.has_sapt), int(system.ff.vdw_type.shape[0]))

    fwd = jax.jit(lambda xx: rp.realspace_inter_cells(
        xx, charge, atype, mol, box, tabs, cells, consts))
    grad = jax.jit(jax.grad(lambda xx: sum(rp.realspace_inter_cells(
        xx, charge, atype, mol, box, tabs, cells, consts))))

    print(f"fwd auto   {timeit(fwd, x):8.3f} ms")
    print(f"f+g auto   {timeit(grad, x):8.3f} ms")

    for impl in ("full", "column"):
        rp.set_stencil_impl(impl)
        fwd2 = jax.jit(lambda xx: rp.realspace_inter_cells(
            xx, charge, atype, mol, box, tabs, cells, consts))
        grad2 = jax.jit(jax.grad(lambda xx: sum(rp.realspace_inter_cells(
            xx, charge, atype, mol, box, tabs, cells, consts))))
        print(f"fwd {impl:6s} {timeit(fwd2, x):8.3f} ms")
        print(f"f+g {impl:6s} {timeit(grad2, x):8.3f} ms")
    rp.set_stencil_impl("auto")

    # ---- ablations share the bin/pack code; kernels are stripped
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nc1, nc2, nc3, ccap = cells
    n_cells = nc1 * nc2 * nc3
    half_offs = rp._offsets(True)
    nsten = len(half_offs)
    J = nsten * ccap
    Jpad = -(-J // 128) * 128

    slot, _ = rp._bin_atoms(x, box, cells)
    C8 = n_cells * ccap
    base = jnp.full((C8 + 1, 8), 0.0, f).at[:, 0:3].set(rp._SENTINEL)
    base = base.at[:, 5].set(-1.0)
    N = x.shape[0]
    vals = jnp.concatenate(
        [x, charge[:, None], atype[:, None], mol[:, None],
         jnp.zeros((N, 2), f)], axis=1)
    cm = base.at[slot].set(vals)[:C8]
    cmt = cm.reshape(n_cells, ccap, 8).transpose(0, 2, 1)

    def k_loadonly(cmt_ref, out_ref, scratch):
        c = pl.program_id(0)
        nbs = [rp._nb_of(c, o, cells) for o in half_offs]
        for k, nb in enumerate(nbs):
            scratch[:, k * ccap:(k + 1) * ccap] = cmt_ref[nb]
        out_ref[...] = scratch[:, 0:ccap].T

    def k_noload(cmt_ref, out_ref, scratch):
        c = pl.program_id(0)
        own = cmt_ref[c].T                       # (ccap, 8)
        # self-cell-only pair math: same transcendental mix as production
        dx = own[:, 0:1] - own[:, 0:1].T[0:1, :]
        r2 = dx * dx + 1.0
        e = jnp.exp(-r2) * rp._erfc_pos(jnp.sqrt(r2))
        out_ref[...] = own + jnp.sum(e, axis=1, keepdims=True)

    def mk(kern):
        return jax.jit(lambda c: pl.pallas_call(
            kern,
            grid=(n_cells,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ccap, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C8, 8), f),
            scratch_shapes=[pltpu.VMEM((8, Jpad), f)],
            interpret=not rp._on_tpu(),
        )(c))

    print(f"loadonly   {timeit(mk(k_loadonly), cmt):8.3f} ms   "
          f"(14 stencil DMAs + 1 small out, no math)")
    print(f"noload     {timeit(mk(k_noload), cmt):8.3f} ms   "
          f"(1 row read, ccap^2 math, no stencil DMAs)")


if __name__ == "__main__":
    main()
