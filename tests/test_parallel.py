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
