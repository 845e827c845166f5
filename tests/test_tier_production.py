"""The PRODUCTION two-tier configuration (cap 80, small tier 48) under
full jit on CPU.

VERDICT r4 item 6: the flagship bench runs auto-tier (48) at cap 80 on
TPU, but no test pinned that exact tier shape on any backend -- the CPU
auto-ban (round-3 XLA:CPU segfault compiling large EAGER cond programs)
kept the suite at small caps.  Round-5 finding (ROUND_NOTES): on the
current worker the cap-80/tier-48 program compiles and runs fine on CPU
both eagerly and under jit (132 s eager init / 96 s jitted step compile,
no crash), so the production shape IS testable here; the auto-tier
remains conservatively off on CPU (hamiltonian.small_state_tier), and an
explicit evb_small_states=48 is the documented way to opt in.

Not in the smoke tier: the two cap-80 branch compiles cost ~3-4 min on
the 1-core host."""

import jax
import jax.numpy as jnp
import numpy as np

from fixtures import make_water_box, write_fixture_files
from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
from reactive_pb_nn_md_tpu.io.topfile import read_top
from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
from reactive_pb_nn_md_tpu.topology import build_system, State
from reactive_pb_nn_md_tpu.models import pme
from reactive_pb_nn_md_tpu.md import integrators, velocities
from reactive_pb_nn_md_tpu.evb import hamiltonian as ham


def _build(tmp_path, extra):
    ff_p, top_p, sim_p = write_fixture_files(tmp_path, msevb="yes",
                                             pme_grid=12, extra=extra)
    cfg = read_sim_params(sim_p)
    frame = make_water_box(8, include_h3o=True, seed=1)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    key, vk = jax.random.split(jax.random.PRNGKey(0))
    v = velocities.sample_velocities(
        vk, system.mass, 300.0, velocities.freeze_mask(system, topo))
    st = State(x=jnp.asarray(frame.xyz, jnp.float64), v=v,
               box=jnp.asarray(frame.box, jnp.float64), key=key,
               step=jnp.asarray(0, jnp.int32))
    cbw = pme.cb_half(st.box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=jnp.float64)
    return system, topo, st, cbw, cfg


def test_production_tier_cap80_small48_jitted(tmp_path):
    system, topo, st, cbw, cfg = _build(
        tmp_path, extra="evb_max_states 80\nevb_small_states 48\n")
    assert system.evb_max_states == 80
    # the exact production tier the TPU auto mode resolves to
    assert ham.small_state_tier(system) == 48

    # ONE init state shared by both paths (initial_md_state's eager CPU
    # force eval is the expensive part; MDState carries no tier config --
    # the System argument does)
    sys_mono = system.replace(evb_small_states=0)
    assert ham.small_state_tier(sys_mono) == 0
    ms = integrators.initial_md_state(st, topo, sys_mono, cbw, 16)

    out_t = integrators.md_step(ms, system, cbw, cfg.delta_t, "NVE")
    assert np.isfinite(float(out_t.potential))
    assert not bool(out_t.evb_overflow)

    # equality vs the monolithic cap-80 pipeline (tier off), same jit
    out_m = integrators.md_step(ms, sys_mono, cbw, cfg.delta_t, "NVE")

    assert int(out_t.n_states) == int(out_m.n_states)
    np.testing.assert_allclose(float(out_t.potential),
                               float(out_m.potential), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out_t.force),
                               np.asarray(out_m.force), atol=1e-9)
    np.testing.assert_allclose(np.asarray(out_t.state.x),
                               np.asarray(out_m.state.x), atol=1e-12)
