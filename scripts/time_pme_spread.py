"""On-chip timing: XLA scatter-add charge spreading vs the Pallas kernel.

Times a scanned loop of forward and forward+grad applications inside ONE
jitted program (the per-dispatch overhead on this stack is ~30 ms, far
above the kernel cost).  Usage:
    python scripts/time_pme_spread.py [n_atoms] [K] [order]
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    g._enable_compile_cache()

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 649
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    order = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    reps = 50

    from reactive_pb_nn_md_tpu.models import pme
    from reactive_pb_nn_md_tpu.ops.pallas import pme_spread

    rng = np.random.default_rng(0)
    L = (n / 0.1) ** (1 / 3)          # ~water number density
    x = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    box = jnp.asarray(np.diag([L, L, L]), jnp.float32)
    print(f"# n={n} K={K} order={order} device={jax.devices()[0]}")

    def bench(name, fn):
        def scanned(x0):
            def body(c, i):
                # nudge positions so iterations cannot be CSE'd away
                out = fn(x0 + 1e-6 * i, q)
                return c + jnp.sum(out), None
            s, _ = jax.lax.scan(body, 0.0, jnp.arange(reps, dtype=jnp.float32))
            return s
        jf = jax.jit(scanned)
        float(jf(x))                                    # compile+warm
        t0 = time.perf_counter()
        v = float(jf(x))
        dt = (time.perf_counter() - t0) / reps * 1000.0
        print(f"{name:24s}: {dt:8.3f} ms   (check {v:.1f})")
        return dt

    from reactive_pb_nn_md_tpu.ops.pallas import pme_slab
    scap = pme_slab.suggest_slab_cap(n, K)
    print(f"# slab scap={scap}")

    def xla_fwd(xx, qq):
        return pme.charge_grid_xla(xx, qq, box, K, order)

    def pal_fwd(xx, qq):
        return pme_spread.charge_grid_pallas(xx, qq, box, K, order)

    def slab_fwd(xx, qq):
        return pme_slab.charge_grid_slab(xx, qq, box, K, order, scap)

    bench("xla spread fwd", xla_fwd)
    bench("pallas spread fwd", pal_fwd)
    bench("slab spread fwd", slab_fwd)

    def grad_of(fn):
        def e(xx, qq):
            Q = fn(xx, qq)
            return jnp.sum(Q * Q)
        gr = jax.grad(e)
        def both(xx, qq):
            return gr(xx, qq)
        return both

    bench("xla spread f+bwd", grad_of(xla_fwd))
    bench("pallas spread f+bwd", grad_of(pal_fwd))
    bench("slab spread f+bwd", grad_of(slab_fwd))


if __name__ == "__main__":
    main()
