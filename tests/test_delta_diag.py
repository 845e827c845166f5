"""The delta-formulated diabat diagonals must equal the full per-diabat
recompute exactly (both paths share positions; unchanged-molecule pairs
cancel analytically)."""

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
from reactive_pb_nn_md_tpu.evb.enumerate import enumerate_diabats
from reactive_pb_nn_md_tpu.evb.topology_ops import build_diabat_topologies
from reactive_pb_nn_md_tpu.evb import hamiltonian as ham


def test_delta_equals_full(tmp_path):
    ff_p, top_p, sim_p = write_fixture_files(tmp_path, msevb="yes")
    cfg = read_sim_params(sim_p)
    frame = make_water_box(63, include_h3o=True, seed=7)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    x = jnp.asarray(frame.xyz)
    box = jnp.asarray(frame.box)
    cap = neighbors.suggest_capacity(system.n_atoms,
                                     float(np.prod(np.diag(frame.box))),
                                     system.verlet_cutoff)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, cap)
    assert not bool(nlist.overflow)
    pairs = neighbors.neighbor_pairs(nlist)
    cbw = pme.cb_half(box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=x.dtype)

    dset = enumerate_diabats(x, box, topo, system)
    batch = build_diabat_topologies(topo, dset, system)
    n = int(dset.n_states)
    assert n > 3

    diag_full, _, recip_full = ham.diabat_diagonal_energies_full(
        x, box, batch, system, pairs, cbw, topo.charge)
    diag_delta, _, recip_delta, _ = ham.diabat_diagonal_energies(
        x, box, batch, system, pairs, cbw, topo.charge, topo,
        nlist.full_idx)

    np.testing.assert_allclose(np.asarray(recip_delta), np.asarray(recip_full),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(diag_delta)[:n],
                               np.asarray(diag_full)[:n], rtol=1e-10)

    # gradients must agree too (forces through the delta path)
    def e_delta(xx):
        d, _, _, _ = ham.diabat_diagonal_energies(
            xx, box, batch, system, pairs, cbw, topo.charge, topo,
            nlist.full_idx)
        return jnp.sum(jnp.where(jnp.arange(system.evb_max_states) < n,
                                 d, 0.0))

    def e_full(xx):
        d, _, _ = ham.diabat_diagonal_energies_full(
            xx, box, batch, system, pairs, cbw, topo.charge)
        return jnp.sum(jnp.where(jnp.arange(system.evb_max_states) < n,
                                 d, 0.0))

    g_delta = jax.grad(e_delta)(x)
    g_full = jax.grad(e_full)(x)
    np.testing.assert_allclose(np.asarray(g_delta), np.asarray(g_full),
                               rtol=1e-7, atol=1e-8)


def test_domain_repulsion_equals_dense(tmp_path):
    """The candidate-row EVB repulsion (ms_evb_repulsion_batched_domain)
    must reproduce the dense O(N)-per-state sweep -- energies and
    gradients -- whenever every switch radius fits the row coverage."""
    from reactive_pb_nn_md_tpu.models import repulsion

    ff_p, top_p, sim_p = write_fixture_files(tmp_path, msevb="yes")
    cfg = read_sim_params(sim_p)
    frame = make_water_box(63, include_h3o=True, seed=11)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    assert 0.0 < system.evb_rep_rc_max <= system.real_space_cutoff
    x = jnp.asarray(frame.xyz)
    box = jnp.asarray(frame.box)
    cap = neighbors.suggest_capacity(system.n_atoms,
                                     float(np.prod(np.diag(frame.box))),
                                     system.verlet_cutoff)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, cap)
    pairs = neighbors.neighbor_pairs(nlist)
    cbw = pme.cb_half(box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=x.dtype)
    dset = enumerate_diabats(x, box, topo, system)
    batch = build_diabat_topologies(topo, dset, system)
    n = int(dset.n_states)
    assert n > 3

    def e_sum(xx):
        d, _, _, _ = ham.diabat_diagonal_energies(
            xx, box, batch, system, pairs, cbw, topo.charge, topo,
            nlist.full_idx)
        return jnp.sum(jnp.where(jnp.arange(system.evb_max_states) < n,
                                 d, 0.0)), d

    try:
        repulsion.set_domain_impl("off")
        (g_dense, d_dense) = jax.grad(e_sum, has_aux=True)(x), None
        g_dense, d_dense = g_dense[0], e_sum(x)[1]
        repulsion.set_domain_impl("on")
        g_dom, d_dom = jax.grad(e_sum, has_aux=True)(x)[0], e_sum(x)[1]
    finally:
        repulsion.set_domain_impl("auto")

    np.testing.assert_allclose(np.asarray(d_dom)[:n], np.asarray(d_dense)[:n],
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_dom), np.asarray(g_dense),
                               rtol=1e-7, atol=1e-8)
