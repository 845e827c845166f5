"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_water_box, write_fixture_files
from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
from reactive_pb_nn_md_tpu.io.topfile import read_top
from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
from reactive_pb_nn_md_tpu.topology import build_system, State
from reactive_pb_nn_md_tpu.models import pme
from reactive_pb_nn_md_tpu.ops import neighbors
from reactive_pb_nn_md_tpu.md import integrators, velocities
from reactive_pb_nn_md_tpu.parallel import ensemble


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_replica_ensemble(tmp_path):
    ff_p, top_p, sim_p = write_fixture_files(tmp_path, msevb="yes",
                                             pme_grid=16)
    cfg = read_sim_params(sim_p)
    frame = make_water_box(8, include_h3o=True, seed=1)  # 28 atoms
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    from reactive_pb_nn_md_tpu.utils.dtypes import default_float
    fdt = default_float()
    key = jax.random.PRNGKey(0)
    key, vkey = jax.random.split(key)
    mobile = velocities.freeze_mask(system, topo)
    v = velocities.sample_velocities(vkey, system.mass, 300.0, mobile)
    state = State(x=jnp.asarray(frame.xyz, fdt), v=v,
                  box=jnp.asarray(frame.box, fdt), key=key,
                  step=jnp.asarray(0, jnp.int32))
    cbw = pme.cb_half(state.box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=fdt)
    ms = integrators.initial_md_state(state, topo, system, cbw, 16)

    mesh = ensemble.make_mesh(8, sp=2)
    assert dict(mesh.shape) == {"replica": 4, "atoms": 2}
    batch = ensemble.stack_replicas(ms, 4, jax.random.PRNGKey(42))
    shardings = ensemble.replica_sharding(mesh, batch)
    batch = jax.device_put(batch, shardings)

    step = ensemble.make_replica_step(system, cbw, cfg.delta_t, "NVT",
                                      friction=5.0, temperature=300.0)
    for _ in range(3):
        batch = step(batch)
    pots = np.asarray(batch.potential)
    assert pots.shape == (4,)
    assert np.all(np.isfinite(pots))
    # distinct PRNG keys -> Langevin replicas diverge
    xs = np.asarray(batch.state.x)
    assert not np.allclose(xs[0], xs[1])


def _single_system(tmp_path, n_water, pme_grid=16, seed=1, extra="",
                   capacity=None, cells=None):
    ff_p, top_p, sim_p = write_fixture_files(tmp_path, msevb="yes",
                                             pme_grid=pme_grid, extra=extra)
    cfg = read_sim_params(sim_p)
    frame = make_water_box(n_water, include_h3o=True, seed=seed)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    from reactive_pb_nn_md_tpu.utils.dtypes import default_float
    fdt = default_float()
    key = jax.random.PRNGKey(0)
    key, vkey = jax.random.split(key)
    mobile = velocities.freeze_mask(system, topo)
    v = velocities.sample_velocities(vkey, system.mass, 300.0, mobile)
    state = State(x=jnp.asarray(frame.xyz, fdt), v=v,
                  box=jnp.asarray(frame.box, fdt), key=key,
                  step=jnp.asarray(0, jnp.int32))
    cbw = pme.cb_half(state.box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=fdt)
    if capacity is None:
        capacity = neighbors.suggest_capacity(
            system.n_atoms, float(np.prod(np.diag(frame.box))),
            system.verlet_cutoff)
    ms = integrators.initial_md_state(state, topo, system, cbw, capacity,
                                      cells)
    return system, cfg, cbw, ms


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_atoms_only_mesh_equality(tmp_path):
    """sp-only mesh {replica: 1, atoms: 8}: one replica sharded over every
    device must produce the single-device step bit-for-bit (up to psum
    reduction reordering), and the compiled HLO must contain collectives."""
    # 12 waters + hydronium = 40 atoms, divisible by 8
    system, cfg, cbw, ms = _single_system(tmp_path, n_water=12)

    mesh = ensemble.make_mesh(8, sp=8)
    assert dict(mesh.shape) == {"replica": 1, "atoms": 8}

    sstep = ensemble.make_atom_sharded_step(system, cbw, cfg.delta_t,
                                            "NVE", mesh, ms)
    ms_sharded = jax.device_put(ms, ensemble.atom_sharding(mesh, ms))
    compiled = sstep.lower(ms_sharded).compile()
    colls = ensemble.collective_summary(compiled)
    assert colls, "no collectives in the sharded step HLO"

    out_s = compiled(ms_sharded)
    out_r = jax.jit(lambda m: integrators.md_step.__wrapped__(
        m, system, cbw, cfg.delta_t, "NVE"))(ms)

    np.testing.assert_allclose(float(out_s.potential),
                               float(out_r.potential), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out_s.force),
                               np.asarray(out_r.force),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out_s.state.x),
                               np.asarray(out_r.state.x),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_10k_cell_list_equality(tmp_path):
    """The 10^4-atom cell-list configuration sharded over the full virtual
    mesh: the sharded step must match the single-device step (VERDICT r1
    item 2).  3332 waters + hydronium = 10000 atoms, 8^3 cell grid."""
    system, cfg, cbw, ms = _single_system(
        tmp_path, n_water=3332, pme_grid=32, extra="evb_max_states 16\n")
    assert system.n_atoms == 10000
    assert ms.nlist.cells, "cell-list build not selected at 10k atoms"
    assert not bool(ms.nbr_overflow)

    mesh = ensemble.make_mesh(8, sp=8)
    sstep = ensemble.make_atom_sharded_step(system, cbw, cfg.delta_t,
                                            "NVE", mesh, ms)
    ms_sharded = jax.device_put(ms, ensemble.atom_sharding(mesh, ms))
    compiled = sstep.lower(ms_sharded).compile()
    colls = ensemble.collective_summary(compiled)
    assert colls, "no collectives in the sharded 10k step HLO"

    out_s = compiled(ms_sharded)
    out_r = jax.jit(lambda m: integrators.md_step.__wrapped__(
        m, system, cbw, cfg.delta_t, "NVE"))(ms)

    np.testing.assert_allclose(float(out_s.potential),
                               float(out_r.potential), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out_s.state.x),
                               np.asarray(out_r.state.x),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out_s.force),
                               np.asarray(out_r.force),
                               rtol=1e-6, atol=1e-6)
