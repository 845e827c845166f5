"""Force-field table compilation unit tests: combination rules and
exclusion generation (initialize_routines.f90:448-634,
intra_bonded_interactions.f90:574-660)."""

import numpy as np
import pytest

from reactive_pb_nn_md_tpu.io.ffpmt import RawForceField, compile_vdw_tables
from reactive_pb_nn_md_tpu.topology import generate_exclusions

pytestmark = pytest.mark.smoke


def _ff(eps_sigma, cross=()):
    n = len(eps_sigma)
    sapt = np.zeros((n, 9))
    sapt[:, 4] = 3.0
    return RawForceField(
        names=[f"T{i}" for i in range(n)],
        charge=np.zeros(n), eps_sigma=np.asarray(eps_sigma, float),
        freeze=np.zeros(n, np.int32), sapt=sapt, has_sapt=False,
        cross_terms=list(cross), pairtypes_14=[])


def test_lorentz_berthelot():
    eps = [(0.5, 3.0), (0.2, 2.0)]
    vt, p, p14 = compile_vdw_tables(_ff(eps), "standard")
    e = np.sqrt(0.5 * 0.2)
    s = 0.5 * (3.0 + 2.0)
    np.testing.assert_allclose(p[0, 1, 0], 4 * e * s ** 12, rtol=1e-12)
    np.testing.assert_allclose(p[0, 1, 1], 4 * e * s ** 6, rtol=1e-12)
    assert vt[0, 1] == 0
    # diagonal converted too
    np.testing.assert_allclose(p[0, 0, 0], 4 * 0.5 * 3.0 ** 12, rtol=1e-12)


def test_opls_geometric():
    eps = [(0.5, 3.0), (0.2, 2.0)]
    vt, p, _ = compile_vdw_tables(_ff(eps), "opls")
    c12 = np.sqrt((4 * 0.5 * 3.0 ** 12) * (4 * 0.2 * 2.0 ** 12))
    c6 = np.sqrt((4 * 0.5 * 3.0 ** 6) * (4 * 0.2 * 2.0 ** 6))
    np.testing.assert_allclose(p[0, 1, 0], c12, rtol=1e-12)
    np.testing.assert_allclose(p[0, 1, 1], c6, rtol=1e-12)


def test_no_interaction_type():
    eps = [(0.5, 3.0), (0.0, 0.0)]
    vt, p, _ = compile_vdw_tables(_ff(eps), "opls")
    assert vt[0, 1] == -1 and vt[1, 1] == -1
    assert vt[0, 0] == 0


def test_exclusions_chain():
    """Linear chain 0-1-2-3-4 with n_exclusions=2: 1-2 and 1-3 neighbors
    excluded, 1-4 neighbors tagged 2, 1-5 normal."""
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4)]
    code = generate_exclusions(5, bonds, 2)
    assert code[0, 1] == 1 and code[0, 2] == 1      # 1-2, 1-3
    assert code[0, 3] == 2                          # 1-4 special
    assert code[0, 4] == 0                          # 1-5 normal
    assert code[0, 0] == 1                          # self
    assert np.array_equal(code, code.T)


def test_exclusions_n3():
    """n_exclusions=3: 1-4 also excluded, no special tags."""
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4)]
    code = generate_exclusions(5, bonds, 3)
    assert code[0, 3] == 1
    assert code[0, 4] == 0
    assert not np.any(code == 2)


def test_explicit_exclusions_preserved():
    bonds = [(0, 1), (1, 2), (2, 3)]
    code = generate_exclusions(4, bonds, 1, explicit=[(0, 3)])
    assert code[0, 3] == 1          # explicit wins over the 1-4 tag
    assert code[0, 2] == 0          # 1-3 not excluded at n_excl=1
