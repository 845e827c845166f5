"""MD integration tests: NVE energy conservation, reactive stepping, CLI
driver, and bit-exact checkpoint/restart (the rebuild's upgrade over the
reference's statistically-continuous restart, README_changes:9)."""

import os

import numpy as np
import pytest

from fixtures import make_water_box, write_fixture_files
from reactive_pb_nn_md_tpu.io.gro import format_gro_frame


def _write_inputs(tmp, n_water, msevb, seed=5, n_step=10, jitter=0.05, **kw):
    ff_p, top_p, sim_p = write_fixture_files(tmp, msevb=msevb,
                                             n_step=n_step, **kw)
    frame = make_water_box(n_water, include_h3o=(msevb == "yes"), seed=seed,
                           jitter=jitter)
    gro_p = tmp / "box.gro"
    gro_p.write_text(format_gro_frame(frame.title, frame.mol_names,
                                      frame.mol_natom, frame.atom_names,
                                      frame.xyz, frame.box))
    return str(gro_p), ff_p, top_p, sim_p


def _sim(tmp, n_water=63, msevb="no", jitter=0.05, **kw):
    from reactive_pb_nn_md_tpu.md.simulation import Simulation
    gro_p, ff_p, top_p, sim_p = _write_inputs(tmp, n_water, msevb,
                                              jitter=jitter, **kw)
    return Simulation(gro_p, ff_p, top_p, sim_p,
                      str(tmp / "traj.gro"), str(tmp / "log.out"),
                      str(tmp / "hop.out"), str(tmp / "a.out"),
                      checkpoint_file=str(tmp / "chk.npz"))


def test_nve_energy_conservation(tmp_path):
    from reactive_pb_nn_md_tpu.md import integrators
    sim = _sim(tmp_path, n_water=64, msevb="no")
    cfg = sim.cfg
    etot = []
    for _ in range(80):
        sim.ms = integrators.md_step(sim.ms, sim.system, sim.cbw,
                                     cfg.delta_t, "NVE")
        etot.append(float(sim.ms.kinetic) + float(sim.ms.potential))
    etot = np.array(etot)
    ke = float(sim.ms.kinetic)
    drift = abs(etot[-1] - etot[0])
    # drift over 40 fs should be well below 1% of kinetic energy
    assert drift < 0.01 * ke, (drift, ke)
    assert np.std(etot) < 0.02 * ke


@pytest.mark.smoke
def test_reactive_md_steps(tmp_path):
    from reactive_pb_nn_md_tpu.md import integrators
    sim = _sim(tmp_path, n_water=63, msevb="yes")
    cfg = sim.cfg
    e0 = float(sim.ms.kinetic) + float(sim.ms.potential)
    for _ in range(10):
        sim.ms = integrators.md_step(sim.ms, sim.system, sim.cbw,
                                     cfg.delta_t, "NVE")
        assert np.isfinite(float(sim.ms.potential))
        assert not bool(sim.ms.force_overflow)
        assert int(sim.ms.n_states) >= 2
    e1 = float(sim.ms.kinetic) + float(sim.ms.potential)
    assert abs(e1 - e0) < 0.05 * float(sim.ms.kinetic)


def test_langevin_stationary_distribution():
    """Force-free Langevin dynamics must sample the Maxwell-Boltzmann
    distribution exactly: per-component velocity variance kT conv / m."""
    import jax
    import jax.numpy as jnp
    from reactive_pb_nn_md_tpu.md.integrators import langevin_half_kick
    from reactive_pb_nn_md_tpu.utils.constants import (
        KB, CONV_KJMOL_A2PS2GMOL)

    n = 512
    mass = jnp.full((n, 1), 12.5)
    v = jnp.zeros((n, 3))
    f = jnp.zeros((n, 3))
    key = jax.random.PRNGKey(0)
    dt, gamma, T = 0.002, 8.0, 300.0

    def body(carry, _):
        v, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        v = langevin_half_kick(v, f, mass, k1, dt, gamma, T)
        v = langevin_half_kick(v, f, mass, k2, dt, gamma, T)
        return (v, key), jnp.mean(v * v)

    (v, _), var_trace = jax.lax.scan(body, (v, key), None, length=4000)
    var_obs = float(np.mean(np.asarray(var_trace[1000:])))
    var_expected = KB * T * CONV_KJMOL_A2PS2GMOL / 12.5
    np.testing.assert_allclose(var_obs, var_expected, rtol=0.05)


def test_langevin_md_finite(tmp_path):
    from reactive_pb_nn_md_tpu.md import integrators
    sim = _sim(tmp_path, n_water=26, msevb="no", ensemble="NVT")
    cfg = sim.cfg
    for _ in range(20):
        sim.ms = integrators.md_step(sim.ms, sim.system, sim.cbw,
                                     cfg.delta_t, "NVT",
                                     friction=5.0, temperature=300.0)
    assert np.isfinite(float(sim.ms.kinetic))
    assert np.isfinite(float(sim.ms.potential))


def test_cli_and_exact_restart(tmp_path):
    from reactive_pb_nn_md_tpu.run import cli
    gro_p, ff_p, top_p, sim_p = _write_inputs(
        tmp_path, 26, "no", n_step=6)
    # give a checkpoint cadence via the sim file
    text = open(sim_p).read() + "checkpoint_velocity   3\n"
    open(sim_p, "w").write(text)
    os.chdir(tmp_path)

    args = [gro_p, ff_p, top_p, sim_p, str(tmp_path / "t.gro"),
            str(tmp_path / "l.out"), str(tmp_path / "h.out"),
            str(tmp_path / "a.out")]
    cli.main(args + ["--steps", "6"])
    assert (tmp_path / "t.gro").exists()
    log1 = (tmp_path / "l.out").read_text()
    assert "step" in log1 and "PE" in log1

    import numpy as np
    chk6 = dict(np.load("velocity_checkpoint.npz"))

    # fresh single 9-step run for ground truth
    for f in ["t.gro", "l.out", "h.out", "velocity_checkpoint.npz"]:
        p = tmp_path / f
        if p.exists():
            p.unlink()
    cli.main(args + ["--steps", "9"])
    chk9 = dict(np.load("velocity_checkpoint.npz"))

    # restart run: recreate the 6-step checkpoint then continue 3 steps
    for f in ["t.gro", "l.out", "h.out", "velocity_checkpoint.npz"]:
        p = tmp_path / f
        if p.exists():
            p.unlink()
    cli.main(args + ["--steps", "6"])
    cli.main(args + ["--steps", "3"])      # auto-detects restart
    chk_restart = dict(np.load("velocity_checkpoint.npz"))

    assert int(chk_restart["step"]) == 9
    # restart recomputes the step-6 forces in a separately-compiled program;
    # XLA fusion differences allow ~1 ulp divergence, nothing more
    np.testing.assert_allclose(chk9["x"], chk_restart["x"],
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(chk9["v"], chk_restart["v"],
                               rtol=1e-10, atol=1e-10)


def test_two_sum_add_compensation():
    """The Kahan carry must survive XLA compilation (the optimization
    barrier in two_sum_add pins the rounding); accumulate a delta below
    half-ulp of the accumulator at fp32: the plain sum loses every add,
    the compensated sum recovers them."""
    import jax
    import jax.numpy as jnp
    from reactive_pb_nn_md_tpu.md.integrators import two_sum_add

    base = jnp.float32(4096.0)            # ulp(4096) = 2^-11 ~ 4.9e-4
    delta = jnp.float32(1.0e-4)           # < ulp/2: plain adds all vanish
    n = 8192

    @jax.jit
    def run(base, delta):
        def body(carry, _):
            acc, c = carry
            acc2, c2 = two_sum_add(acc, delta, c)
            return (acc2, c2), None

        (acc, c), _ = jax.lax.scan(body, (base, jnp.float32(0.0)), None,
                                   length=n)

        def body_plain(acc, _):
            return acc + delta, None

        plain, _ = jax.lax.scan(body_plain, base, None, length=n)
        return acc + c, plain

    comp, plain = run(base, delta)
    exact = 4096.0 + n * 1.0e-4
    assert abs(float(comp) - exact) < 1e-2, (float(comp), exact)
    # the plain fp32 sum must have lost a visible fraction (sanity that the
    # test exercises the rounding regime at all)
    assert abs(float(plain) - exact) > 0.05, (float(plain), exact)


def test_compensated_step_equals_plain_from_zero_carry(tmp_path):
    """With zero carries the compensated update performs the identical
    arithmetic (d = delta + 0 is exact): positions after one step match the
    plain integrator bit-for-bit (first kick + drift both start from zero
    carries); velocities differ only by the second kick's carry -- one
    rounding error -- so they match to ~1 ulp.  Pins the wiring."""
    from reactive_pb_nn_md_tpu.md import integrators
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    simA = _sim(tmp_path / "a", n_water=16, msevb="no")
    simB = _sim(tmp_path / "b", n_water=16, msevb="no",
                extra="compensated_sum    yes\n")
    assert simB.system.compensated_sum and not simA.system.compensated_sum
    assert simB.ms.comp is not None and simA.ms.comp is None
    a = integrators.md_step(simA.ms, simA.system, simA.cbw,
                            simA.cfg.delta_t, "NVE")
    b = integrators.md_step(simB.ms, simB.system, simB.cbw,
                            simB.cfg.delta_t, "NVE")
    np.testing.assert_array_equal(np.asarray(a.state.x),
                                  np.asarray(b.state.x))
    np.testing.assert_allclose(np.asarray(a.state.v),
                               np.asarray(b.state.v),
                               rtol=1e-6, atol=1e-9)


def test_compensated_nve_conserves(tmp_path):
    """Compensated NVE runs and conserves energy (scan path, carries
    threaded through the chunk)."""
    from reactive_pb_nn_md_tpu.md import integrators
    sim = _sim(tmp_path, n_water=64, msevb="no",
               extra="compensated_sum    yes\n")
    ms, diag = integrators.md_scan(sim.ms, sim.system, sim.cbw,
                                   sim.cfg.delta_t, "NVE", 80)
    etot = np.asarray(diag.potential) + np.asarray(diag.kinetic)
    assert np.all(np.isfinite(etot))
    ke = float(np.asarray(diag.kinetic)[-1])
    assert abs(etot[-1] - etot[0]) < 0.01 * ke
    assert ms.comp is not None


def test_compensated_exact_restart(tmp_path):
    """Restarting a compensated_sum run must restore the Kahan carries from
    the checkpoint: the continued trajectory matches an uninterrupted run."""
    from reactive_pb_nn_md_tpu.run import cli
    gro_p, ff_p, top_p, sim_p = _write_inputs(
        tmp_path, 16, "no", n_step=6,
        extra="compensated_sum    yes\n")
    text = open(sim_p).read() + "checkpoint_velocity   3\n"
    open(sim_p, "w").write(text)
    os.chdir(tmp_path)

    args = [gro_p, ff_p, top_p, sim_p, str(tmp_path / "t.gro"),
            str(tmp_path / "l.out"), str(tmp_path / "h.out"),
            str(tmp_path / "a.out")]
    cli.main(args + ["--steps", "9"])
    chk9 = dict(np.load("velocity_checkpoint.npz"))
    assert "comp_x" in chk9 and "comp_v" in chk9

    for f in ["t.gro", "l.out", "h.out", "velocity_checkpoint.npz"]:
        p = tmp_path / f
        if p.exists():
            p.unlink()
    cli.main(args + ["--steps", "6"])
    cli.main(args + ["--steps", "3"])      # auto-detects restart
    chk_r = dict(np.load("velocity_checkpoint.npz"))

    assert int(chk_r["step"]) == 9
    np.testing.assert_allclose(chk9["x"], chk_r["x"], rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(chk9["v"], chk_r["v"], rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(chk9["comp_x"], chk_r["comp_x"],
                               rtol=1e-10, atol=1e-14)
