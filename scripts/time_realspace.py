"""On-chip timing: XLA half-list pair sweep vs the fused Pallas cell-pair
kernel (ops/pallas/realspace_pair.py), forward and forward+grad.

Times a scanned loop inside ONE jitted program (per-dispatch overhead on
this stack is ~30 ms).  Usage:
    python scripts/time_realspace.py [n_water] [cutoff]
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    g._enable_compile_cache()
    from reactive_pb_nn_md_tpu.utils.dtypes import set_precision
    set_precision("fp32")

    n_water = int(sys.argv[1]) if len(sys.argv) > 1 else 215
    cutoff = float(sys.argv[2]) if len(sys.argv) > 2 else 4.5
    reps = 50

    from fixtures import make_water_box, write_fixture_files
    from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
    from reactive_pb_nn_md_tpu.io.topfile import read_top
    from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
    from reactive_pb_nn_md_tpu.topology import build_system
    from reactive_pb_nn_md_tpu.models import total as T
    from reactive_pb_nn_md_tpu.ops import neighbors
    from reactive_pb_nn_md_tpu.ops.pallas import realspace_pair as rsp
    import tempfile

    tmp = pathlib.Path(tempfile.mkdtemp())
    ff_p, top_p, sim_p = write_fixture_files(
        tmp, msevb="yes", cutoff=cutoff, verlet_cutoff=cutoff + 1.0)
    (tmp / "sim.pmt").write_text(
        (tmp / "sim.pmt").read_text().replace("fp64", "fp32"))
    cfg = read_sim_params(sim_p)
    frame = make_water_box(n_water, include_h3o=True, seed=4)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    f = jnp.float32
    x = jnp.asarray(frame.xyz, f)
    box = jnp.asarray(frame.box, f)
    cap = neighbors.suggest_capacity(system.n_atoms,
                                     float(np.prod(np.diag(frame.box))),
                                     system.verlet_cutoff)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, cap)
    pairs = neighbors.neighbor_pairs(nlist)
    print(f"# atoms={system.n_atoms} rs_cells={system.rs_cells} "
          f"cap={cap} device={jax.devices()[0]}")

    tabs = rsp._build_tabs(system, f)
    consts = (float(system.real_space_cutoff), float(system.alpha_sqrt),
              bool(system.has_sapt), int(system.ff.vdw_type.shape[0]))
    qf = topo.charge.astype(f)
    tf = topo.atom_type.astype(f)
    mf = topo.atom_mol.astype(f)

    def ker(xx):
        a, b = rsp.realspace_inter_cells(xx, qf, tf, mf, box, tabs,
                                         system.rs_cells, consts)
        return a + b

    def xla(xx):
        a, b = T._realspace_inter_xla(xx, box, topo, system, pairs)
        return a + b

    def bench(name, fn):
        def scanned(x0):
            def body(c, _):
                e = fn(c)
                return c + 1e-12 * e, e
            return jax.lax.scan(body, x0, None, length=reps)[1][-1]

        sj = jax.jit(scanned)
        v = float(sj(x))
        t0 = time.perf_counter()
        v = float(sj(x))
        dt = (time.perf_counter() - t0) / reps * 1000.0
        print(f"{name:24s}: {dt:8.3f} ms   (E={v:.4f})")

    for name, fn in (("xla fwd", xla), ("pallas fwd", ker)):
        bench(name, fn)
    for name, fn in (("xla fwd+grad", xla), ("pallas fwd+grad", ker)):
        gfn = jax.value_and_grad(fn)
        bench(name, lambda xx, g=gfn: g(xx)[0] + jnp.sum(g(xx)[1]) * 1e-12)
    # realistic: grad only (MD wants forces)
    for name, fn in (("xla grad", xla), ("pallas grad", ker)):
        gfn = jax.grad(fn)
        bench(name, lambda xx, g=gfn: jnp.sum(g(xx)))


if __name__ == "__main__":
    main()
