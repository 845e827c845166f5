"""Umbrella-sampling workflow: bias forces, window ladders, WHAM/PMF.

BASELINE config 5's scientific purpose (proton-transfer free energies from
a restrained replica ladder).  Validation pyramid:

  1. WHAM alone recovers a KNOWN analytic double-well PMF from synthetic
     biased samples (no MD -- isolates the estimator).
  2. The harmonic bias force matches finite differences for both CV types
     (isolates the restraint in the force path).
  3. A biased MD ladder on the tiny reactive water fixture holds each
     window near its center, the per-step CV diagnostic matches a host
     recomputation, and the full ladder -> WHAM pipeline returns a finite
     PMF (end-to-end plumbing).
"""

import math

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
from reactive_pb_nn_md_tpu.md.bias import (HarmonicBias, bias_energy,
                                           bias_energy_force,
                                           collective_variable)
from reactive_pb_nn_md_tpu.parallel import ensemble, umbrella
from reactive_pb_nn_md_tpu.analysis import wham
from reactive_pb_nn_md_tpu.utils.constants import KB


# ---------------------------------------------------------------------------
# 1. WHAM on synthetic double-well data
# ---------------------------------------------------------------------------

@pytest.mark.smoke
def test_wham_recovers_double_well():
    """Draw exact samples from each window's biased Boltzmann density on a
    double well U0 = a (xi^2 - b^2)^2 (barrier ~ 5.8 kT), run WHAM, and
    demand the recovered PMF match U0 to ~0.15 kT over the sampled range."""
    rng = np.random.default_rng(3)
    kT = KB * 300.0
    a, b = 10.0, 0.6                     # barrier a b^4 = 1.296 kJ/mol/...
    a = 5.8 * kT / b ** 4                # exactly 5.8 kT barrier

    def u0(xi):
        return a * (xi ** 2 - b ** 2) ** 2

    # window width sigma = sqrt(kT/k) must be ~ the center spacing for
    # overlap: spacing 0.1 -> k = kT / 0.1^2 = 100 kT
    k_spring = 100.0 * kT
    centers = np.linspace(-0.9, 0.9, 19)
    grid = np.linspace(-1.4, 1.4, 4001)
    series = []
    for c in centers:
        w = np.exp(-(u0(grid) + 0.5 * k_spring * (grid - c) ** 2) / kT)
        cdf = np.cumsum(w)
        cdf /= cdf[-1]
        series.append(np.interp(rng.random(40000), cdf, grid))

    res = wham.wham(series, centers, k_spring, 300.0, n_bins=81,
                    bin_range=(-1.0, 1.0))
    assert res["converged"]
    mids, pmf = res["bin_centers"], res["pmf"]
    ref = u0(mids)
    ref -= ref.min()
    # compare where the ladder actually sampled (>=200 counts/bin)
    ok = np.isfinite(pmf) & (res["counts"].sum(axis=0) >= 200)
    assert ok.sum() > 60
    # min-align the comparison on the sampled support
    err = np.abs((pmf[ok] - pmf[ok].min()) - (ref[ok] - ref[ok].min()))
    assert err.max() < 0.2 * kT, f"max WHAM error {err.max() / kT:.2f} kT"

    barrier, xi_b, lo, hi = wham.barrier_height(mids, pmf)
    assert abs(barrier - 5.8 * kT) < 0.3 * kT
    assert abs(xi_b) < 0.1

    # block bootstrap returns a sane, small uncertainty band on the
    # well-sampled bins (edge bins are tail-only and legitimately noisy)
    res2, std = wham.wham_bootstrap(series, centers, k_spring, 300.0,
                                    n_boot=5, n_bins=81,
                                    bin_range=(-1.0, 1.0))
    assert np.nanmax(std[ok]) < 0.3 * kT


def test_wham_single_window_flat_prior():
    """One unbiased 'window' sampling exp(-U0/kT) directly: WHAM must
    reduce to the plain Boltzmann inversion of the histogram."""
    rng = np.random.default_rng(0)
    kT = KB * 300.0
    samples = rng.normal(0.0, math.sqrt(kT / 50.0), size=200000)
    res = wham.wham([samples], [0.0], 0.0, 300.0, n_bins=41,
                    bin_range=(-0.5, 0.5))
    mids, pmf = res["bin_centers"], res["pmf"]
    ref = 0.5 * 50.0 * mids ** 2
    ok = np.isfinite(pmf) & (ref < 3.0 * kT)
    assert np.abs(pmf[ok] - (ref[ok] - ref[ok].min())).max() < 0.15 * kT


# ---------------------------------------------------------------------------
# 2. bias force vs finite differences
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cv_type", [0, 1])
def test_bias_force_finite_difference(cv_type):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0.0, 6.0, (12, 3)))
    box = jnp.eye(3) * 6.2
    bias = HarmonicBias(atoms=jnp.asarray([3, 9, 4], jnp.int32),
                        k=jnp.asarray(120.0), center=jnp.asarray(0.3),
                        cv_type=cv_type)
    e, f = bias_energy_force(x, box, bias)
    assert np.isfinite(float(e))
    h = 1e-6
    for (i, d) in [(3, 0), (9, 2), (4, 1), (0, 0)]:
        xp = x.at[i, d].add(h)
        xm = x.at[i, d].add(-h)
        fd = -(float(bias_energy(xp, box, bias))
               - float(bias_energy(xm, box, bias))) / (2 * h)
        np.testing.assert_allclose(float(f[i, d]), fd, rtol=2e-5,
                                   atol=1e-7)
    # non-participating atoms carry no bias force
    mask = np.ones(12, bool)
    mask[[3, 9, 4]] = False
    assert np.abs(np.asarray(f)[mask]).max() == 0.0


def test_bias_tuple_is_additive():
    """A tuple of restraints (window + R_OO keeper) sums energies and
    forces; primary_cv reports the first restraint's coordinate."""
    from reactive_pb_nn_md_tpu.md.bias import primary_cv
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(0.0, 6.0, (10, 3)))
    box = jnp.eye(3) * 6.5
    at = jnp.asarray([1, 5, 8], jnp.int32)
    b0 = HarmonicBias(atoms=at, k=jnp.asarray(200.0),
                      center=jnp.asarray(-0.2), cv_type=0)
    b1 = HarmonicBias(atoms=at, k=jnp.asarray(80.0),
                      center=jnp.asarray(2.5), cv_type=1)
    e, f = bias_energy_force(x, box, (b0, b1))
    e0, f0 = bias_energy_force(x, box, b0)
    e1, f1 = bias_energy_force(x, box, b1)
    np.testing.assert_allclose(float(e), float(e0) + float(e1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f0 + f1),
                               atol=1e-12)
    np.testing.assert_allclose(
        float(primary_cv(x, box, (b0, b1))),
        float(collective_variable(x, box, b0)), rtol=1e-12)


def test_cv_values_match_geometry():
    """CV definitions against a hand-built configuration."""
    x = np.zeros((5, 3))
    x[0] = [1.0, 1.0, 1.0]          # donor O
    x[1] = [3.4, 1.0, 1.0]          # acceptor O -> R_OO = 2.4
    x[2] = [2.0, 1.0, 1.0]          # H: 1.0 from donor, 1.4 from acceptor
    box = jnp.eye(3) * 12.0
    at = jnp.asarray([0, 1, 2], jnp.int32)
    b0 = HarmonicBias(atoms=at, k=jnp.asarray(1.0), center=jnp.asarray(0.0),
                      cv_type=0)
    b1 = b0.replace(cv_type=1)
    np.testing.assert_allclose(
        float(collective_variable(jnp.asarray(x), box, b0)), -0.4,
        atol=1e-12)
    np.testing.assert_allclose(
        float(collective_variable(jnp.asarray(x), box, b1)), 2.4,
        atol=1e-12)
    # minimum image: move the acceptor across the boundary
    x2 = x.copy()
    x2[1, 0] += 12.0
    np.testing.assert_allclose(
        float(collective_variable(jnp.asarray(x2), box, b1)), 2.4,
        atol=1e-9)


# ---------------------------------------------------------------------------
# 3. end-to-end: biased ladder on the reactive water fixture
# ---------------------------------------------------------------------------

def _tiny_reactive(tmp_path, n_water=8):
    ff_p, top_p, sim_p = write_fixture_files(tmp_path, msevb="yes",
                                             pme_grid=12)
    cfg = read_sim_params(sim_p)
    frame = make_water_box(n_water, include_h3o=True, seed=1)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    fdt = jnp.float64
    key, vkey = jax.random.split(jax.random.PRNGKey(0))
    mobile = velocities.freeze_mask(system, topo)
    v = velocities.sample_velocities(vkey, system.mass, 300.0, mobile)
    state = State(x=jnp.asarray(frame.xyz, fdt), v=v,
                  box=jnp.asarray(frame.box, fdt), key=key,
                  step=jnp.asarray(0, jnp.int32))
    cbw = pme.cb_half(state.box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=fdt)
    cap = neighbors.suggest_capacity(
        system.n_atoms, float(np.prod(np.diag(frame.box))),
        system.verlet_cutoff)
    ms = integrators.initial_md_state(state, topo, system, cbw, cap)
    return system, cfg, cbw, ms


@pytest.mark.smoke
def test_umbrella_ladder_end_to_end(tmp_path):
    """4-window ΔR_OH ladder on the 28-atom reactive fixture: each window's
    sampled CV stays near its center (stiff spring), the scan diagnostic
    CV equals a host recomputation, hops near xi=0 are tolerated, and the
    ladder -> WHAM pipeline returns a finite PMF."""
    system, cfg, cbw, ms = _tiny_reactive(tmp_path)
    atoms = umbrella.transfer_triple(ms, system)
    # the triple is (hydronium O, nearest heavy of another mol, donor H)
    assert int(np.asarray(ms.topo.atom_mol)[atoms[0]]) \
        == int(np.asarray(ms.topo.hydronium_mol))
    assert int(np.asarray(ms.topo.atom_mol)[atoms[1]]) \
        != int(np.asarray(ms.topo.hydronium_mol))

    centers = np.array([-0.8, -0.4, 0.0, 0.4])
    k_spring = 800.0
    ladder = umbrella.make_ladder(atoms, centers, k_spring,
                                  dtype=ms.state.x.dtype)
    W = centers.shape[0]
    batch = ensemble.stack_replicas(ms, W, jax.random.PRNGKey(5))
    scan = umbrella.make_ladder_scan(system, cbw, cfg.delta_t, "NVT", 10,
                                     friction=20.0, temperature=300.0)
    batch, cv, info = umbrella.sample_ladder(scan, batch, ladder,
                                             n_equil=40, n_sample=60,
                                             chunk=10)
    assert cv.shape == (W, 60)
    assert np.isfinite(cv).all()
    assert not info["overflow"]
    # stiff windows hold their centers (loose tolerance: 60 samples)
    for w in range(W):
        assert abs(cv[w].mean() - centers[w]) < 0.35, \
            (w, cv[w].mean(), centers[w])
    # the diagnostic CV must equal a host recomputation on the final state
    b_last = jax.tree_util.tree_map(lambda a: a[-1], ladder)
    cv_host = float(collective_variable(batch.state.x[-1],
                                        batch.state.box[-1], b_last))
    np.testing.assert_allclose(cv[-1, -1], cv_host, rtol=1e-6, atol=1e-9)

    res = wham.wham(cv, centers, k_spring, 300.0, n_bins=25)
    assert np.isfinite(res["pmf"]).sum() >= 10
    assert res["converged"]


def test_biased_md_scan_matches_step(tmp_path):
    """md_scan with a bias equals repeated md_step with the same bias, and
    the bias energy enters the reported potential."""
    system, cfg, cbw, ms = _tiny_reactive(tmp_path, n_water=6)
    atoms = umbrella.transfer_triple(ms, system)
    bias = HarmonicBias(atoms=jnp.asarray(atoms),
                        k=jnp.asarray(300.0, ms.state.x.dtype),
                        center=jnp.asarray(-0.5, ms.state.x.dtype))
    ms_scan, diag = integrators.md_scan(ms, system, cbw, cfg.delta_t,
                                        "NVE", 3, bias=bias)
    ms_step = ms
    for _ in range(3):
        ms_step = integrators.md_step(ms_step, system, cbw, cfg.delta_t,
                                      "NVE", bias=bias)
    np.testing.assert_allclose(np.asarray(ms_scan.state.x),
                               np.asarray(ms_step.state.x), atol=1e-12)
    np.testing.assert_allclose(float(ms_scan.potential),
                               float(ms_step.potential), rtol=1e-12)
    # potential includes the restraint energy: recompute without it
    from reactive_pb_nn_md_tpu.md.bias import bias_energy as be_fn
    be = float(be_fn(ms_step.state.x, ms_step.state.box, bias))
    assert be > 0.0
    fe = integrators.evaluate_forces(ms_step.state.x, ms_step.state.box,
                                     ms_step.topo, system, ms_step.nlist,
                                     cbw)
    np.testing.assert_allclose(float(ms_step.potential),
                               float(fe.potential) + be, rtol=1e-10)
