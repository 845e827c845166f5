"""Engine-side golden-parity dump (scripts/parity_reference.py).

The Fortran side cannot run in-container (no toolchain — docs/PARITY.md);
these tests pin the ENGINE side of the harness: the dump schema is
complete and self-consistent, the differ passes on self-comparison, and
it FAILS loudly on a genuinely different evaluation (so a future
reference-vs-engine diff means something)."""

import importlib.util
import json
import pathlib
import sys

import numpy as np
import pytest

from fixtures import make_water_box, write_fixture_files
from reactive_pb_nn_md_tpu.io.gro import format_gro_frame

_SPEC = importlib.util.spec_from_file_location(
    "parity_reference",
    pathlib.Path(__file__).resolve().parent.parent / "scripts"
    / "parity_reference.py")
parity = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(parity)


def _deck(tmp_path, seed=1, n_water=8):
    ff_p, top_p, sim_p = write_fixture_files(tmp_path, msevb="yes",
                                             pme_grid=12, n_step=0)
    frame = make_water_box(n_water, include_h3o=True, seed=seed)
    gro_p = tmp_path / "box.gro"
    gro_p.write_text(format_gro_frame(
        "parity deck", frame.mol_names, frame.mol_natom, frame.atom_names,
        frame.xyz, frame.box))
    return str(gro_p), ff_p, top_p, sim_p


@pytest.mark.smoke
def test_parity_dump_schema_and_self_diff(tmp_path):
    gro, ff, top, sim = _deck(tmp_path)
    out = tmp_path / "engine.json"
    dump = parity.engine_dump(gro, ff, top, sim, out)

    # schema completeness + self-consistency
    assert dump["schema"].startswith("reactive_pb_nn_md parity dump")
    S = dump["n_states"]
    assert S >= 2, "reactive deck must enumerate >1 diabat"
    H = np.asarray(dump["H_kjmol"])
    assert H.shape == (S, S)
    np.testing.assert_allclose(H, H.T, atol=1e-9)   # symmetrized
    assert len(dump["diabat_signature"]) == S
    assert dump["diabat_signature"][0] == []        # principle: no hops
    assert dump["diabat_hydronium"][0] == dump["hydronium_mol"]
    # each non-principle signature ends on that diabat's hydronium
    for s in range(1, S):
        assert dump["diabat_signature"][s][-1][1] \
            == dump["diabat_hydronium"][s]
    F = np.asarray(dump["force_kjmol_per_A"])
    assert F.shape == (dump["n_atoms"], 3)
    assert np.isfinite(F).all()
    c = np.asarray(dump["eigenvector"])
    np.testing.assert_allclose(np.sum(c * c), 1.0, rtol=1e-8)
    # ground energy is c^T H c
    np.testing.assert_allclose(dump["ground_energy_kjmol"], c @ H @ c,
                               rtol=1e-8)

    # the JSON round-trips and self-diff passes
    reread = json.loads(out.read_text())
    ok, rep = parity.diff_dumps(dump, reread, verbose=False)
    assert ok, "\n".join(rep)


def test_parity_diff_detects_differences(tmp_path):
    """Diffing two DIFFERENT configurations must fail: the harness is
    only evidence if it can reject."""
    gro1, ff, top, sim = _deck(tmp_path, seed=1)
    d1 = parity.engine_dump(gro1, ff, top, sim)
    (tmp_path / "b").mkdir()
    gro2, ff2, top2, sim2 = _deck(tmp_path / "b", seed=2)
    d2 = parity.engine_dump(gro2, ff2, top2, sim2)
    ok, rep = parity.diff_dumps(d1, d2, verbose=False)
    assert not ok
    # a small force perturbation alone must also be caught
    d3 = json.loads(json.dumps(d1))
    d3["force_kjmol_per_A"][0][0] += 5e-4
    ok, rep = parity.diff_dumps(d1, d3, verbose=False)
    assert not ok
    assert any("force" in line and line.startswith("FAIL")
               for line in rep)
