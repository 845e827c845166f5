"""NPT Monte-Carlo barostat tests (monte_carlo_barostat semantics)."""

import numpy as np

from fixtures import make_water_box, write_fixture_files
from reactive_pb_nn_md_tpu.io.gro import format_gro_frame


def _sim(tmp, **kw):
    import sys
    sys.path.insert(0, "tests")
    from test_md import _sim as base
    return base(tmp, **kw)


def test_barostat_moves_volume(tmp_path):
    from reactive_pb_nn_md_tpu.md import integrators
    from reactive_pb_nn_md_tpu.md.barostat import MCBarostat
    sim = _sim(tmp_path, n_water=26, msevb="no", ensemble="NVE")

    baro = MCBarostat(pressure=1000.0, temperature=300.0, baroscale=0.02,
                      seed=1)
    L0 = float(sim.ms.state.box[0, 0])
    vols = []
    cbw = sim.cbw
    for _ in range(12):
        sim.ms, cbw = baro.attempt(sim.ms, sim.system, cbw)
        vols.append(float(sim.ms.state.box[0, 0]) ** 3)
        sim.ms = integrators.md_step(sim.ms, sim.system, cbw,
                                     sim.cfg.delta_t, "NVE")
    assert baro.n_accept + (12 - baro.n_trials) >= 0
    assert any(abs(v - L0 ** 3) > 1e-9 for v in vols), \
        "barostat never moved the volume"
    assert np.isfinite(float(sim.ms.potential))
    # molecules must stay intact: bond energy finite and small-ish
    assert float(sim.ms.breakdown.bond) < 1e5


def test_npt_run_via_driver(tmp_path):
    sim = _sim(tmp_path, n_water=26, msevb="yes", ensemble="NPT",
               n_step=6)
    # give the config a pressure + short barofreq
    sim.cfg.pressure = 1.0
    sim.cfg.barofreq = 3
    from reactive_pb_nn_md_tpu.md.barostat import MCBarostat
    sim.barostat = MCBarostat(1.0, sim.cfg.temperature,
                              sim.cfg.baroscale, 0)
    sim.run(6)
    log = (tmp_path / "log.out").read_text()
    assert "volume" in log
    assert "completed 6 steps" in log


def test_baroscale_adapts_toward_acceptance_band(tmp_path):
    """Adaptive baroscale (md_integration.f90:374-384): past 10 trials, a
    history outside the 25-75% acceptance band adapts the scale and
    resets the counters.  The trial history is seeded directly so the
    branch decision does not depend on the Metropolis draw (a "reject"
    half-box trial can legitimately accept through the entropy term)."""
    from reactive_pb_nn_md_tpu.md.barostat import MCBarostat
    sim = _sim(tmp_path, n_water=26, msevb="no", ensemble="NVE")

    baro = MCBarostat(pressure=1.0, temperature=300.0, baroscale=1e-6,
                      seed=2)
    baro.n_trials, baro.n_accept = 11, 11     # all-accept history
    _, _ = baro.attempt(sim.ms, sim.system, sim.cbw)
    assert baro.baroscale > 1e-6, "all-accept history must grow baroscale"
    assert baro.n_trials == 0 and baro.n_accept == 0  # counters reset

    baro = MCBarostat(pressure=1.0, temperature=300.0, baroscale=1e-6,
                      seed=3)
    baro.n_trials, baro.n_accept = 11, 0      # all-reject history
    _, _ = baro.attempt(sim.ms, sim.system, sim.cbw)
    assert baro.baroscale < 1e-6, "all-reject history must shrink baroscale"
    assert baro.n_trials == 0 and baro.n_accept == 0


def test_forced_accept_on_hop(tmp_path):
    """A proton hop during the trial forces acceptance even when the
    Metropolis weight would reject (md_integration.f90:320-323): start
    mid-transfer so the trial's force evaluation flips the principle
    diabat, and make pV large and positive."""
    import jax.numpy as jnp
    from reactive_pb_nn_md_tpu.md.barostat import MCBarostat
    sim = _sim(tmp_path, n_water=26, msevb="yes", ensemble="NVE")

    topo = sim.ms.topo
    x = np.array(sim.ms.state.x)   # writable copy
    L = np.diag(np.asarray(sim.ms.state.box))
    hyd = int(topo.hydronium_mol)
    atoms = np.asarray(topo.mol_atoms[hyd])
    o_h3o, h = int(atoms[0]), int(atoms[1])
    # nearest water oxygen to the chosen proton
    best, bd = None, 1e9
    for m in range(sim.system.n_mole):
        if m == hyd:
            continue
        ow = int(np.asarray(topo.mol_atoms[m])[0])
        dr = x[ow] - x[h]
        dr -= np.round(dr / L) * L
        d = np.linalg.norm(dr)
        if d < bd:
            bd, best = d, ow
    dr = x[best] - x[o_h3o]
    dr -= np.round(dr / L) * L
    axis = dr / np.linalg.norm(dr)
    x[h] = x[best] - 1.00 * axis          # proton 1.0 A from the water O
    sim.ms = sim.ms.replace(state=sim.ms.state.replace(x=jnp.asarray(x)))

    baro = MCBarostat(pressure=1e8, temperature=300.0, baroscale=1e-6,
                      seed=0)
    ms2, _ = baro.attempt(sim.ms, sim.system, sim.cbw)
    assert baro.n_accept == 1, "hop during trial must force acceptance"
    assert int(ms2.topo.hydronium_mol) != hyd, "topology must switch"
    assert np.isfinite(float(ms2.potential))
