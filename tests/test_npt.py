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
