"""End-to-end non-reactive pipeline: finite-difference force verification.

This is the rebuild's analog of the reference's numerical force verification
practice (README_changes:11) -- and covers every term: bonds, angles, Morse,
LJ, Ewald real/reciprocal/self, exclusion corrections."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_water_box, write_fixture_files
from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
from reactive_pb_nn_md_tpu.io.topfile import read_top
from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
from reactive_pb_nn_md_tpu.topology import build_system
from reactive_pb_nn_md_tpu.models import total as total_mod
from reactive_pb_nn_md_tpu.models import pme
from reactive_pb_nn_md_tpu.ops import neighbors


@pytest.fixture(scope="module")
def water_system(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("water")
    ff_p, top_p, sim_p = write_fixture_files(tmp, msevb="yes")
    cfg = read_sim_params(sim_p)
    frame = make_water_box(63, include_h3o=True, seed=7)
    system, topo = build_system(read_gro_frame(frame), read_ffpmt(ff_p),
                                read_top(top_p), cfg)
    x = jnp.asarray(frame.xyz)
    box = jnp.asarray(frame.box)
    return system, topo, x, box


def read_gro_frame(frame):
    return frame  # fixture already is a GroFrame


def _energy_fn(system, topo, box, pairs, cbw):
    def f(x):
        return total_mod.total_energy(x, box, topo, system, pairs, cbw).total
    return f


@pytest.mark.smoke
def test_finite_difference_forces(water_system):
    system, topo, x, box = water_system
    cap = neighbors.suggest_capacity(system.n_atoms,
                                     float(jnp.linalg.det(box)),
                                     system.verlet_cutoff)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, cap)
    assert not bool(nlist.overflow)
    pairs = neighbors.neighbor_pairs(nlist)
    cbw = pme.cb_half(box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=x.dtype)

    f = _energy_fn(system, topo, box, pairs, cbw)
    e0 = f(x)
    assert np.isfinite(float(e0))
    force = -jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(force)))

    rng = np.random.default_rng(0)
    h = 1e-5
    for _ in range(6):
        a = int(rng.integers(0, system.n_atoms))
        d = int(rng.integers(0, 3))
        dx = np.zeros_like(np.asarray(x))
        dx[a, d] = h
        ep = f(x + jnp.asarray(dx))
        em = f(x - jnp.asarray(dx))
        fd = -(float(ep) - float(em)) / (2 * h)
        np.testing.assert_allclose(float(force[a, d]), fd, rtol=2e-5,
                                   atol=1e-6)


def test_energy_translation_invariance(water_system):
    system, topo, x, box = water_system
    cap = neighbors.suggest_capacity(system.n_atoms,
                                     float(jnp.linalg.det(box)),
                                     system.verlet_cutoff)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, cap)
    pairs = neighbors.neighbor_pairs(nlist)
    cbw = pme.cb_half(box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=x.dtype)
    f = _energy_fn(system, topo, box, pairs, cbw)
    e0 = float(f(x))
    shift = jnp.asarray([0.731, -0.294, 0.512])
    e1 = float(f(x + shift))
    # tolerance covers cutoff-crossing + PME grid discretization (same
    # truncation physics as the reference)
    np.testing.assert_allclose(e0, e1, rtol=1e-9, atol=5e-2)


def test_neighbor_list_matches_bruteforce(water_system):
    system, topo, x, box = water_system
    cap = neighbors.suggest_capacity(system.n_atoms,
                                     float(jnp.linalg.det(box)),
                                     system.verlet_cutoff)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, cap)
    i, j, mask = neighbors.neighbor_pairs(nlist)
    mask = np.asarray(mask)
    i = np.broadcast_to(np.asarray(i), mask.shape).reshape(-1)
    j = np.asarray(j).reshape(-1)
    mask = mask.reshape(-1)
    got = set()
    for a, b, m in zip(i, j, mask):
        if m:
            got.add((int(a), int(b)))

    from reactive_pb_nn_md_tpu.utils import pbc
    xn = np.asarray(x)
    want = set()
    N = xn.shape[0]
    for a in range(N):
        dr = xn[a] - xn[a + 1:]
        dr = np.asarray(pbc.min_image(jnp.asarray(dr), box))
        d2 = (dr ** 2).sum(axis=1)
        for k in np.nonzero(d2 < system.verlet_cutoff ** 2)[0]:
            want.add((a, a + 1 + int(k)))
    assert got == want
