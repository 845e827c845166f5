import os

import numpy as np
import pytest

from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt, compile_vdw_tables
from reactive_pb_nn_md_tpu.io.topfile import read_top
from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
from reactive_pb_nn_md_tpu.io.gro import read_gro, format_gro_frame

pytestmark = pytest.mark.smoke

REF_DIR = "/root/reference/example_input_files"


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference not mounted")
def test_reference_ffpmt():
    ff = read_ffpmt(os.path.join(REF_DIR, "CH3SO3H.pmt"))
    assert ff.n_types == 12
    assert ff.names[0] == "C_a" and ff.names[8] == "OW"
    assert ff.charge[1] == 1.2
    assert len(ff.cross_terms) == 2
    # 1-based in file -> 0-based here
    assert ff.cross_terms[0][:2] == (10, 8)
    assert len(ff.pairtypes_14) == 2
    vdw_type, params, params14 = compile_vdw_tables(ff, "opls")
    iOW = ff.names.index("OW")
    iOh3o = ff.names.index("O_h3o")
    iHa = ff.names.index("H_a")
    iOa = ff.names.index("O_a")
    # explicit cross term: C12 first, C6 second
    assert params[iOh3o, iOW, 0] == 1917990.0
    assert params[iOh3o, iOW, 1] == 1993.468
    assert vdw_type[iOh3o, iOW] == 0
    # h3o oxygen has eps=0 -> no diagonal vdw
    assert vdw_type[iOh3o, iOh3o] == -1
    # OW-OW diagonal: opls C12 = 4 eps sigma^12
    eps, sig = 0.6502995, 3.16549
    np.testing.assert_allclose(params[iOW, iOW, 0], 4 * eps * sig ** 12,
                               rtol=1e-12)
    # 1-4 override
    assert params14[iHa, iOa, 0] == 66466.2
    assert params14[iHa, iOa, 1] == 434.1


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference not mounted")
def test_reference_top():
    top = read_top(os.path.join(REF_DIR, "CH3SO3H_H2O.top"))
    names = [m.name for m in top.molecule_types]
    assert names == ["so3h", "so3", "h2o", "h3o"]
    so3h = top.molecule_types[0]
    assert so3h.n_atom == 6
    assert len(so3h.bonds) == 5
    assert len(so3h.angles) == 4
    assert len(so3h.dihedrals) == 4

    # bond types: Morse for O_ah-H_a
    func, params = top.bond_types[("O_ah", "H_a")]
    assert func == 3
    assert params == [372.2086, 2.1, 0.97]
    # angle converted to radians
    func, params = top.angle_types[("HW", "OW", "HW")]
    assert func == 1
    np.testing.assert_allclose(params[0], np.radians(113.24))

    # EVB sections
    assert top.has_evb
    assert len(top.evb_pairs) == 2
    p0 = top.evb_pairs[0]
    assert (p0.acid_name, p0.base_name) == ("so3h", "so3")
    assert p0.proton_type == "H_a" and p0.heavy_type == "O_ah"
    assert p0.acid_reactive_protons[5] == 1
    assert top.reference_energy["so3h"] == -643.65
    assert len(top.donor_acceptor) == 3
    assert len(top.proton_acceptor) == 3
    assert len(top.diabat_coupling) == 3
    key, func, params = top.diabat_coupling[0]
    assert key == ("OW", "O_h3o", "H_h3o")
    assert func == 1 and params[0] == -97.0151921
    assert top.exchange_charge_atomic["S_b"] == 0.229278
    assert top.exchange_charge_proton[("h3o", "h2o")] == 0.078018
    # conjugate atoms: O_a -> O_b line comes last and overwrites
    assert ("O_a", "O_b") == top.evb_pairs[0].conjugate_atoms[-1]


def test_gro_roundtrip(tmp_path):
    from fixtures import make_water_box
    frame = make_water_box(7, include_h3o=True, seed=3)
    text = format_gro_frame(frame.title, frame.mol_names, frame.mol_natom,
                            frame.atom_names, frame.xyz, frame.box)
    p = tmp_path / "box.gro"
    p.write_text(text)
    back = read_gro(str(p))
    assert back.n_mole == frame.n_mole
    assert back.atom_names == frame.atom_names
    np.testing.assert_allclose(back.xyz, frame.xyz, atol=5e-3)
    np.testing.assert_allclose(back.box, frame.box, atol=1e-3)


def test_sim_params(tmp_path):
    from fixtures import write_fixture_files
    _, _, sim = write_fixture_files(tmp_path)
    cfg = read_sim_params(sim)
    assert cfg.ensemble == "NVE"
    assert cfg.ms_evb_simulation
    assert cfg.lj_comb_rule == "opls"
    assert cfg.spline_order == 6
    assert cfg.initial_temp == cfg.temperature == 300.0
