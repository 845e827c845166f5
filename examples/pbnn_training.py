"""Train the PB-NN diabatic coupling (function type 3).

Demonstrates the two-stage recipe for replacing an analytic MS-EVB
off-diagonal with a neural one:

  1. pretrain the MLP geometric factor A_nn(q², R_OO) against a target
     surface (here: the MS-EVB3 analytic form itself, standing in for
     ab-initio coupling data);
  2. fine-tune END-TO-END through the adiabatic ground-state energy of a
     real water+hydronium box — the whole MS-EVB surface (enumeration,
     per-diabat energies, eigh, Hellmann-Feynman) is differentiable with
     respect to the MLP parameters.

Runs on CPU in a couple of minutes:

    python examples/pbnn_training.py
"""

import pathlib
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

from fixtures import make_water_box, write_fixture_files  # noqa: E402
from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt  # noqa: E402
from reactive_pb_nn_md_tpu.io.topfile import read_top  # noqa: E402
from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params  # noqa: E402
from reactive_pb_nn_md_tpu.topology import build_system  # noqa: E402
from reactive_pb_nn_md_tpu.models import pme  # noqa: E402
from reactive_pb_nn_md_tpu.models.coupling import geometric_factor  # noqa: E402
from reactive_pb_nn_md_tpu.ops import neighbors  # noqa: E402
from reactive_pb_nn_md_tpu.evb import hamiltonian as ham  # noqa: E402
from reactive_pb_nn_md_tpu.nn.coupling_mlp import init_mlp, apply_mlp  # noqa: E402


def pretrain(params, msevb3_params, key, steps=400, lr=3e-3):
    """Stage 1: regress A_nn onto the MS-EVB3 geometric factor over the
    physically relevant (q², R_OO) range (R_OO 2.2-3.2 Å, |q| 0-0.6 Å)."""
    import optax
    opt = optax.adam(lr)
    state = opt.init(params)

    def target(q2, roo):
        return geometric_factor(jnp.asarray(1), msevb3_params,
                                jnp.stack([jnp.sqrt(q2), 0.0, 0.0]),
                                jnp.stack([roo, 0.0, 0.0]))

    @jax.jit
    def step(params, state, key):
        kq, kr = jax.random.split(key)
        q2 = jax.random.uniform(kq, (256,), minval=0.0, maxval=0.36)
        roo = jax.random.uniform(kr, (256,), minval=2.2, maxval=3.2)

        def loss_fn(p):
            pred = jax.vmap(lambda a, b: apply_mlp(p, a, b))(q2, roo)
            ref = jax.vmap(target)(q2, roo)
            return jnp.mean((pred - ref) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    for i in range(steps):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, sub)
        if i % 100 == 0 or i == steps - 1:
            print(f"  pretrain step {i:4d}  mse {float(loss):.3e}")
    return params


def main():
    tmp = pathlib.Path(tempfile.mkdtemp())
    ff_p, top_p, sim_p = write_fixture_files(tmp, msevb="yes")
    cfg = read_sim_params(sim_p)
    frame = make_water_box(26, include_h3o=True, seed=4)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)

    names = system.ff.atype_names
    iOW = names.index("OW")
    iO, iH = names.index("O_h3o"), names.index("H_h3o")
    msevb3_params = system.evb.cpl_params[iOW, iO, iH]
    vconst_ref = float(msevb3_params[0])

    # ---- stage 1: pretrain A_nn on the analytic geometric factor
    key = jax.random.PRNGKey(0)
    nn = init_mlp(key, hidden=(16, 16), vconst=vconst_ref,
                  dtype=jnp.float64)
    print("stage 1: pretraining A_nn(q^2, R_OO) on the MS-EVB3 form")
    nn = pretrain(nn, msevb3_params, jax.random.PRNGKey(1))

    # ---- stage 2: fine-tune through the adiabatic energy
    cpl_func = system.evb.cpl_func.at[iOW, iO, iH].set(3)
    sys_nn = system.replace(evb=system.evb.replace(cpl_func=cpl_func))

    x = jnp.asarray(frame.xyz)
    box = jnp.asarray(frame.box)
    cap = neighbors.suggest_capacity(system.n_atoms,
                                     float(np.prod(np.diag(frame.box))),
                                     system.verlet_cutoff)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, cap)
    pairs = neighbors.neighbor_pairs(nlist)
    cbw = pme.cb_half(box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=x.dtype)

    # reference adiabatic energies from the analytic coupling on a batch of
    # jittered configurations (stand-in for ab-initio energies)
    rng = np.random.default_rng(7)
    configs = [x + jnp.asarray(rng.normal(0, 0.02, x.shape)) for _ in range(4)]

    def adiabatic(xx, sys_):
        res, _ = ham.adiabatic_energy_force(xx, box, topo, sys_, pairs, cbw,
                                            full_idx=nlist.full_idx)
        return res.energy

    e_ref = jnp.stack([adiabatic(c, system) for c in configs])
    print("stage 2: fine-tuning through the adiabatic ground-state energy")

    def loss_fn(nn_params):
        s = sys_nn.replace(evb=sys_nn.evb.replace(nn_params=nn_params))
        e = jnp.stack([adiabatic(c, s) for c in configs])
        return jnp.mean((e - e_ref) ** 2)

    import optax
    opt = optax.adam(1e-3)
    state = opt.init(nn)
    step_fn = jax.jit(jax.value_and_grad(loss_fn))
    for i in range(5):
        loss, g = step_fn(nn)
        upd, state = opt.update(g, state)
        nn = optax.apply_updates(nn, upd)
        print(f"  fine-tune step {i}  rmse {float(jnp.sqrt(loss)):.4f} kJ/mol")

    print("done: nn_params trained; attach with "
          "system.replace(evb=system.evb.replace(nn_params=nn)) and "
          "coupling function type 3 in the topology")


if __name__ == "__main__":
    main()
