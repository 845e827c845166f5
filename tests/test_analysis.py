import numpy as np
import jax.numpy as jnp
import pytest

from fixtures import make_water_box, write_fixture_files
from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
from reactive_pb_nn_md_tpu.io.topfile import read_top
from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
from reactive_pb_nn_md_tpu.topology import build_system
from reactive_pb_nn_md_tpu.evb import analysis
from reactive_pb_nn_md_tpu.evb.enumerate import enumerate_diabats


def test_hbond_network_counts(tmp_path):
    ff_p, top_p, sim_p = write_fixture_files(tmp_path, msevb="yes")
    cfg = read_sim_params(sim_p)
    frame = make_water_box(63, include_h3o=True, seed=7)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    x = jnp.asarray(frame.xyz)
    box = jnp.asarray(frame.box)
    n_accept, n_donate = analysis.hbond_network(x, box, topo, system)
    assert 0 <= n_accept <= 10
    assert 0 <= n_donate <= 10

    dset = enumerate_diabats(x, box, topo, system)
    c = np.zeros(system.evb_max_states)
    c[0] = 1.0
    rows = analysis.diabat_report(dset.hydronium_of, dset.n_hops, c,
                                  dset.n_states)
    assert len(rows) == int(dset.n_states)
    assert rows[0][1] == int(topo.hydronium_mol) + 1
    assert rows[0][3] == 0 and all(r[3] >= 1 for r in rows[1:])
    block = analysis.format_diabat_report(7, rows)
    assert f"number of diabats {len(rows)}" in block
    assert block.count("hydronium_molecule") == len(rows)
