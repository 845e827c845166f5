"""PB-NN: neural diabatic-coupling function type 3.

Checks that (a) switching a coupling triple to type 3 routes through the
MLP, (b) the adiabatic energy is differentiable w.r.t. the MLP parameters
(trainable end-to-end), and (c) forces stay finite."""

import jax
import jax.numpy as jnp
import numpy as np

from fixtures import make_water_box, write_fixture_files
from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
from reactive_pb_nn_md_tpu.io.topfile import read_top
from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
from reactive_pb_nn_md_tpu.topology import build_system
from reactive_pb_nn_md_tpu.models import pme
from reactive_pb_nn_md_tpu.ops import neighbors
from reactive_pb_nn_md_tpu.evb import hamiltonian as ham
from reactive_pb_nn_md_tpu.nn.coupling_mlp import init_mlp


def test_nn_coupling_trainable(tmp_path):
    ff_p, top_p, sim_p = write_fixture_files(tmp_path, msevb="yes")
    cfg = read_sim_params(sim_p)
    frame = make_water_box(26, include_h3o=True, seed=9)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)

    # switch the (OW, O_h3o, H_h3o) coupling triple to the NN form
    names = system.ff.atype_names
    iOW, iO, iH = names.index("OW"), names.index("O_h3o"), names.index("H_h3o")
    cpl_func = system.evb.cpl_func.at[iOW, iO, iH].set(3)
    nn = init_mlp(jax.random.PRNGKey(0), hidden=(8, 8), vconst=-97.0,
                  dtype=jnp.float64)
    system = system.replace(evb=system.evb.replace(cpl_func=cpl_func,
                                                   nn_params=nn))

    x = jnp.asarray(frame.xyz)
    box = jnp.asarray(frame.box)
    cap = neighbors.suggest_capacity(system.n_atoms,
                                     float(np.prod(np.diag(frame.box))),
                                     system.verlet_cutoff)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, cap)
    pairs = neighbors.neighbor_pairs(nlist)
    cbw = pme.cb_half(box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=x.dtype)

    res, _ = ham.adiabatic_energy_force(x, box, topo, system, pairs, cbw,
                                        full_idx=nlist.full_idx)
    assert np.isfinite(float(res.energy))
    assert np.all(np.isfinite(np.asarray(res.force)))
    H = np.asarray(res.hamiltonian)
    n = int(res.n_states)
    assert n >= 2
    off = [H[int(res.principle), d] for d in range(1, n)]
    assert any(abs(v) > 1e-8 for v in off), "NN coupling produced all zeros"

    # trainability: d(adiabatic energy)/d(nn weights) is nonzero
    def loss(nn_params):
        sys2 = system.replace(evb=system.evb.replace(nn_params=nn_params))
        r, _ = ham.adiabatic_energy_force(x, box, topo, sys2, pairs, cbw,
                                          full_idx=nlist.full_idx)
        return r.energy

    g = jax.grad(loss)(nn)
    gnorm = sum(float(jnp.sum(jnp.abs(w))) for w in g["w"]) \
        + float(jnp.abs(g["vconst"]))
    assert np.isfinite(gnorm) and gnorm > 0.0
