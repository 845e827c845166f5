"""Iterative ground-state solver vs jnp.linalg.eigh, on synthetic EVB-like
Hamiltonians and on matrices from an actual reactive run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reactive_pb_nn_md_tpu.ops.ground_state import (ground_state,
                                                    ground_state_eigh)

# span of the inactive park ABOVE the principle diagonal -- mirrors
# evb.hamiltonian.INACTIVE_DIAG (relative parking; an absolute 1e8 park
# destroyed fp32 eigh mixing, see test_f32_eigh_mixing_production_scale)
INACTIVE = 1.0e5


def _evb_like(S, n_active, rng, diag_spread=50.0, coupling=30.0, gap=None):
    """Padded EVB Hamiltonian: tree-sparse couplings, parked inactive
    diag (relative to the principle diagonal, as the engine builds it)."""
    diag = -24000.0 + diag_spread * rng.standard_normal(S)
    if gap is not None:
        diag[1] = diag[0] + gap            # engineered near-degeneracy
    H = np.diag(diag)
    for s in range(1, n_active):
        p = rng.integers(0, s)             # tree parent, like the hop log
        v = coupling * rng.standard_normal()
        H[p, s] = H[s, p] = v
    for s in range(n_active, S):
        H[s, s] = diag[0] + INACTIVE * (1.0 + s / S)
        H[s, :s] = H[:s, s] = 0.0
    return jnp.asarray(H, jnp.float64)


@pytest.mark.parametrize("seed", range(8))
def test_matches_eigh_random(seed):
    rng = np.random.default_rng(seed)
    H = _evb_like(32, int(rng.integers(2, 28)), rng)
    lam_i, c_i = ground_state(H)
    lam_e, c_e = ground_state_eigh(H)
    assert abs(float(lam_i - lam_e)) < 1e-8 * abs(float(lam_e))
    assert float(jnp.abs(jnp.abs(c_i @ c_e) - 1.0)) < 1e-7


def test_near_degenerate_energy_insensitive():
    """With an engineered tiny ground gap the energy must still match; the
    vector may mix within the near-degenerate subspace."""
    rng = np.random.default_rng(42)
    H = _evb_like(16, 10, rng, gap=1e-7)
    lam_i, _ = ground_state(H)
    lam_e, _ = ground_state_eigh(H)
    assert abs(float(lam_i - lam_e)) < 1e-5


def test_f32_accuracy():
    rng = np.random.default_rng(7)
    H64 = _evb_like(32, 20, rng)
    H32 = H64.astype(jnp.float32)
    lam_i, c_i = ground_state(H32)
    lam_e, c_e = ground_state_eigh(H64)
    # f32 resolution on a ~2.4e4 magnitude: ~1e-2 absolute
    assert abs(float(lam_i) - float(lam_e)) < 5e-2
    assert float(jnp.abs(jnp.abs(c_i.astype(jnp.float64) @ c_e) - 1.0)) < 1e-5


def test_f32_eigh_mixing_production_scale():
    """REGRESSION (round-5 find): fp32 ground_state_eigh must recover the
    adiabatic mixing of a production-scale EVB matrix -- |H00| ~ 8.7e3
    kJ/mol, gap ~ 190, coupling ~ -110, S = 80 padded.  Before the
    relative-park + spectral-shift fix, fp32 eigh returned c = (1, 0, ...)
    (NO mixing) on exactly this matrix shape: the absolute 1e8 park made
    eps * ||H|| ~ 12 kJ/mol, and the unshifted |H00| another ~1e-3
    relative floor; the TPU reactive path lost the Zundel crossing
    entirely (coupling strength had zero effect on dynamics)."""
    S, n_active = 80, 19
    rng = np.random.default_rng(5)
    diag = -8700.0 + 400.0 * rng.random(S)
    diag[0] = -8700.0
    diag[1] = diag[0] + 190.0              # first-shell acceptor
    H = np.diag(diag)
    H[0, 1] = H[1, 0] = -110.0             # strong Zundel coupling
    for s in range(2, n_active):
        H[0, s] = H[s, 0] = -30.0 * rng.random()
    for s in range(n_active, S):
        H[s, s] = diag[0] + INACTIVE * (1.0 + s / S)
        H[s, :s] = H[:s, s] = 0.0

    w64, v64 = np.linalg.eigh(H[:n_active, :n_active])
    c_ref = v64[:, 0]
    assert 0.2 < abs(c_ref[1]) < 0.9       # the matrix genuinely mixes

    lam32, c32 = ground_state_eigh(jnp.asarray(H, jnp.float32))
    c32 = np.asarray(c32, np.float64)[:n_active]
    overlap = abs(c32 @ c_ref)
    assert overlap > 0.999, f"fp32 eigh lost the mixing: overlap {overlap}"
    assert abs(float(lam32) - w64[0]) < 0.5, (float(lam32), w64[0])


def test_residual_is_small_under_jit_vmap():
    rng = np.random.default_rng(3)
    Hs = jnp.stack([_evb_like(24, 12, rng) for _ in range(6)])
    lam, c = jax.jit(jax.vmap(ground_state))(Hs)
    res = jnp.linalg.norm(jnp.einsum("bij,bj->bi", Hs, c)
                          - lam[:, None] * c, axis=1)
    assert float(res.max()) < 1e-6 * INACTIVE  # scaled by inactive diag
    assert float(res.max()) < 1e-3


def test_reactive_run_hamiltonians(tmp_path):
    """H from live MD steps: iterative and eigh agree on energy, ground
    vector, and the induced principle-diabat choice."""
    import sys
    sys.path.insert(0, "tests")
    from fixtures import make_water_box, write_fixture_files
    from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
    from reactive_pb_nn_md_tpu.io.topfile import read_top
    from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
    from reactive_pb_nn_md_tpu.topology import build_system, State
    from reactive_pb_nn_md_tpu.models import pme
    from reactive_pb_nn_md_tpu.ops import neighbors
    from reactive_pb_nn_md_tpu.md import integrators, velocities

    ff_p, top_p, sim_p = write_fixture_files(tmp_path, msevb="yes",
                                             pme_grid=16)
    frame = make_water_box(26, include_h3o=True, seed=11)
    cfg = read_sim_params(sim_p)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    v = velocities.sample_velocities(
        jax.random.PRNGKey(1), system.mass, 300.0,
        velocities.freeze_mask(system, topo))
    state = State(x=jnp.asarray(frame.xyz), v=v,
                  box=jnp.asarray(frame.box), key=jax.random.PRNGKey(0),
                  step=jnp.asarray(0, jnp.int32))
    cbw = pme.cb_half(state.box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=state.x.dtype)
    ms = integrators.initial_md_state(state, topo, system, cbw, 32)

    from reactive_pb_nn_md_tpu.evb import hamiltonian as ham
    for _ in range(6):
        ms = integrators.md_step(ms, system, cbw, cfg.delta_t, "NVE")
        pairs = neighbors.neighbor_pairs(ms.nlist)
        res, _ = ham.adiabatic_energy_force(
            ms.state.x, ms.state.box, ms.topo, system, pairs, cbw,
            full_idx=ms.nlist.full_idx)
        H = res.hamiltonian
        lam_i, c_i = ground_state(H)
        lam_e, c_e = ground_state_eigh(H)
        assert abs(float(lam_i - lam_e)) < 1e-6 * abs(float(lam_e))
        assert float(jnp.abs(jnp.abs(c_i @ c_e) - 1.0)) < 1e-8
        assert int(jnp.argmax(jnp.abs(c_i))) == int(jnp.argmax(jnp.abs(c_e)))
