"""Parity tests for the fused Pallas real-space cell-pair kernel
(ops/pallas/realspace_pair.py) against the XLA half-list path, run in
interpret mode on CPU (the same code compiles on TPU).

Covers: LJ water (energies + gradients), SAPT Buckingham on the
reference's own CH3SO3H force field, and the capacity-overflow probe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_water_box, write_fixture_files
from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
from reactive_pb_nn_md_tpu.io.topfile import read_top
from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
from reactive_pb_nn_md_tpu.topology import build_system
from reactive_pb_nn_md_tpu.models import total as T
from reactive_pb_nn_md_tpu.ops import neighbors
from reactive_pb_nn_md_tpu.ops.pallas import realspace_pair as rsp


def _water_setup(tmp_path, n_water=63, cutoff=3.0):
    ff_p, top_p, sim_p = write_fixture_files(
        tmp_path, msevb="yes", cutoff=cutoff, verlet_cutoff=cutoff + 1.0)
    cfg = read_sim_params(sim_p)
    frame = make_water_box(n_water, include_h3o=True, seed=4)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    x = jnp.asarray(frame.xyz)
    box = jnp.asarray(frame.box)
    cap = neighbors.suggest_capacity(system.n_atoms,
                                     float(np.prod(np.diag(frame.box))),
                                     system.verlet_cutoff, safety=2.0)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, cap)
    assert not bool(nlist.overflow)
    pairs = neighbors.neighbor_pairs(nlist)
    return system, topo, x, box, pairs


def _kernel_call(system, topo, x, box):
    f = x.dtype
    tabs = rsp._build_tabs(system, f)
    consts = (float(system.real_space_cutoff), float(system.alpha_sqrt),
              bool(system.has_sapt), int(system.ff.vdw_type.shape[0]))
    return rsp.realspace_inter_cells(
        x, topo.charge.astype(f), topo.atom_type.astype(f),
        topo.atom_mol.astype(f), box, tabs, system.rs_cells, consts)


def test_erfc_approximation():
    """In-kernel erfc (A&S 7.1.26) vs the exact function."""
    from jax.scipy.special import erfc as erfc_exact
    x = jnp.linspace(0.0, 8.0, 4001)
    err = np.abs(np.asarray(rsp._erfc_pos(x)) - np.asarray(erfc_exact(x)))
    assert err.max() < 2e-7, err.max()


def test_cell_config_selected(tmp_path):
    system, topo, x, box, pairs = _water_setup(tmp_path)
    assert system.rs_cells, "cell grid not selected for the 193-atom box"
    nc1, nc2, nc3, ccap = system.rs_cells
    assert min(nc1, nc2, nc3) >= 3 and ccap % 8 == 0


def test_energy_parity_lj(tmp_path):
    system, topo, x, box, pairs = _water_setup(tmp_path)
    e_el_ref, e_vdw_ref = T.realspace_inter(x, box, topo, system, pairs)
    e_el, e_vdw = _kernel_call(system, topo, x, box)
    # e_el tolerance is set by the in-kernel erfc approximation (1.5e-7
    # absolute per pair); vdW shares no approximation -> tight
    np.testing.assert_allclose(float(e_el), float(e_el_ref),
                               rtol=1e-6, atol=5e-3)
    np.testing.assert_allclose(float(e_vdw), float(e_vdw_ref), rtol=1e-10)


def test_gradient_parity_lj(tmp_path):
    system, topo, x, box, pairs = _water_setup(tmp_path)

    def e_ref(xx):
        a, b = T.realspace_inter(xx, box, topo, system, pairs)
        return a + 0.37 * b

    def e_ker(xx):
        a, b = _kernel_call(system, topo, xx, box)
        return a + 0.37 * b

    g_ref = jax.grad(e_ref)(x)
    g_ker = jax.grad(e_ker)(x)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-4)


SAPT_FF_PMT = """
solute_species
atom_type_parameters
4
OW    -0.82    0.0   0.0   0.0  0.0
HW     0.41    0.0   0.0   0.0  0.0
O_h3o -0.5     0.0   0.0   0.0  0.0
H_h3o  0.5     0.0   0.0   0.0  0.0

custom_sapt_parameters
name  A_ex A_el A_ind A_dhf  B  C6 C8 C10 C12
OW    2.2e5  8.0e4  1.0e4  5.0e3   3.2   1900.0  20000.0  150000.0  800000.0
HW    1.0e4  4.0e3  8.0e2  4.0e2   3.8   40.0   300.0   1500.0   6000.0
O_h3o 0 0 0 0 0 0 0 0 0
H_h3o 0 0 0 0 0 0 0 0 0
"""


def test_energy_and_gradient_parity_sapt(tmp_path):
    """SAPT Buckingham + Tang-Toennies path (analytic in-kernel
    derivatives vs autodiff of the XLA path) on a synthetic SAPT water
    force field (the shipped CH3SO3H example is all-LJ)."""
    ff_p, top_p, sim_p = write_fixture_files(
        tmp_path, msevb="yes", cutoff=3.0, verlet_cutoff=4.0)
    (tmp_path / "ff.pmt").write_text(SAPT_FF_PMT)
    cfg = read_sim_params(sim_p)
    frame = make_water_box(63, include_h3o=True, seed=4)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    assert system.has_sapt
    assert system.rs_cells, "cell grid not selected for the SAPT box"
    x = jnp.asarray(frame.xyz)
    box = jnp.asarray(frame.box)
    cap = neighbors.suggest_capacity(system.n_atoms,
                                     float(np.prod(np.diag(frame.box))),
                                     system.verlet_cutoff, safety=2.0)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, cap)
    assert not bool(nlist.overflow)
    pairs = neighbors.neighbor_pairs(nlist)

    e_el_ref, e_vdw_ref = T.realspace_inter(x, box, topo, system, pairs)
    e_el, e_vdw = _kernel_call(system, topo, x, box)
    np.testing.assert_allclose(float(e_el), float(e_el_ref),
                               rtol=1e-6, atol=5e-3)
    np.testing.assert_allclose(float(e_vdw), float(e_vdw_ref), rtol=1e-9)

    def e_ref(xx):
        a, b = T.realspace_inter(xx, box, topo, system, pairs)
        return a + b

    def e_ker(xx):
        a, b = _kernel_call(system, topo, xx, box)
        return a + b

    g_ref = jax.grad(e_ref)(x)
    g_ker = jax.grad(e_ker)(x)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-4)


def test_overflow_probe(tmp_path):
    system, topo, x, box, pairs = _water_setup(tmp_path)
    cells = system.rs_cells
    over = rsp.rs_cell_overflow(x, box, cells, system.real_space_cutoff)
    assert not bool(over)
    # cram every atom into one corner -> one cell overflows
    x_bad = jnp.zeros_like(x) + 0.1
    assert bool(rsp.rs_cell_overflow(x_bad, box, cells,
                                     system.real_space_cutoff))
    # shrunk box -> cell width below cutoff
    assert bool(rsp.rs_cell_overflow(x * 0.5, box * 0.5, cells,
                                     system.real_space_cutoff))


def test_half_vs_full_stencil(tmp_path):
    """The half-stencil enumeration (default) must match the full
    27-stencil path exactly up to summation order: energies and the
    stored per-atom gradients."""
    system, topo, x, box, pairs = _water_setup(tmp_path)
    assert system.rs_cells

    def both(impl):
        rsp.set_stencil_impl(impl)
        try:
            e = _kernel_call(system, topo, x, box)
            f = x.dtype
            tabs = rsp._build_tabs(system, f)
            consts = (float(system.real_space_cutoff),
                      float(system.alpha_sqrt), bool(system.has_sapt),
                      int(system.ff.vdw_type.shape[0]))
            _, _, (g_el, g_vdw), _ = rsp._forward(
                x, topo.charge.astype(f), topo.atom_type.astype(f),
                topo.atom_mol.astype(f), box, tabs, system.rs_cells,
                consts)
        finally:
            rsp.set_stencil_impl("auto")
        return e, g_el, g_vdw

    (ee_f, ev_f), gel_f, gvd_f = both("full")
    for impl in ("half", "column"):
        (ee_h, ev_h), gel_h, gvd_h = both(impl)
        assert np.isclose(float(ee_h), float(ee_f), rtol=1e-10,
                          atol=1e-8), impl
        assert np.isclose(float(ev_h), float(ev_f), rtol=1e-10,
                          atol=1e-8), impl
        np.testing.assert_allclose(np.asarray(gel_h), np.asarray(gel_f),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(gvd_h), np.asarray(gvd_f),
                                   rtol=1e-9, atol=1e-9)
