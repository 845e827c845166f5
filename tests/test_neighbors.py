"""Cell-list neighbor build vs the dense sweep (same pair sets)."""

import numpy as np
import jax.numpy as jnp
import pytest

from reactive_pb_nn_md_tpu.ops import neighbors


def _pair_set(idx):
    out = set()
    for i, row in enumerate(np.asarray(idx)):
        for j in row:
            if j >= 0:
                out.add((i, int(j)))
    return out


def _random_box(n, L, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, L, size=(n, 3)))
    box = jnp.asarray(np.diag([L, L, L]).astype(np.float64))
    return x, box


@pytest.mark.parametrize("n,L,cutoff", [(200, 20.0, 4.5), (400, 24.0, 6.0)])
def test_cell_list_matches_dense(n, L, cutoff):
    x, box = _random_box(n, L, seed=3)
    cap = neighbors.suggest_capacity(n, L ** 3, cutoff, safety=2.0)
    dense = neighbors.build_neighbor_list(x, box, cutoff, cap)
    cells = neighbors.suggest_cells(n, np.asarray(box), cutoff, min_atoms=1)
    assert cells, "expected a valid cell grid for this box"
    cell = neighbors.build_neighbor_list_cell(x, box, cutoff, cap, cells)
    assert not bool(dense.overflow)
    assert not bool(cell.overflow)
    assert _pair_set(dense.idx) == _pair_set(cell.idx)
    assert _pair_set(dense.full_idx) == _pair_set(cell.full_idx)
    # full list is the symmetrized half list
    full = _pair_set(cell.full_idx)
    assert {(j, i) for i, j in full} == full
    assert {(i, j) for i, j in full if j > i} == _pair_set(cell.idx)


@pytest.mark.parametrize("cells", [False, True])
def test_build_half_skip(cells):
    """build_half=False (fused-kernel path: the half list has no consumer)
    must return an empty idx but identical full/react adjacencies, and
    rebuild_like must preserve the choice."""
    n, L, cutoff = 1200, 24.0, 4.5
    x, box = _random_box(n, L, seed=9)
    cap = neighbors.suggest_capacity(n, L ** 3, cutoff, safety=1.5)
    cl = neighbors.suggest_cells(n, box, cutoff) if cells else ()
    if cells:
        assert cl
    a = neighbors.build_neighbors(x, box, cutoff, cap, cl,
                                  react_cutoff=3.0, react_cap=24)
    b = neighbors.build_neighbors(x, box, cutoff, cap, cl,
                                  react_cutoff=3.0, react_cap=24,
                                  build_half=False)
    assert b.idx.shape == (n, 0)
    np.testing.assert_array_equal(np.asarray(a.full_idx),
                                  np.asarray(b.full_idx))
    np.testing.assert_array_equal(np.asarray(a.react_idx),
                                  np.asarray(b.react_idx))
    assert bool(a.overflow) == bool(b.overflow) == False  # noqa: E712
    b2 = neighbors.rebuild_like(b, x, box, cutoff)
    assert b2.idx.shape == (n, 0)
    # the XLA pair sweep refuses to run from a skipped half list
    from reactive_pb_nn_md_tpu.models.total import _realspace_inter_xla
    with pytest.raises(ValueError, match="build_half"):

        class _Sys:
            n_atoms = n
        _realspace_inter_xla(x, box, None, _Sys(),
                             neighbors.neighbor_pairs(b))


def test_cell_capacity_overflow_flag():
    x, box = _random_box(300, 18.0, seed=1)
    cells = neighbors.suggest_cells(300, np.asarray(box), 4.0, min_atoms=1)
    tiny = (cells[0], cells[1], cells[2], 2)   # 2 atoms/cell: must overflow
    nl = neighbors.build_neighbor_list_cell(x, box, 4.0, 64, tiny)
    assert bool(nl.overflow)


def test_cell_box_shrink_overflow_flag():
    """NPT shrink below one cutoff per cell flags the list invalid."""
    x, box = _random_box(200, 20.0, seed=2)
    cells = neighbors.suggest_cells(200, np.asarray(box), 4.5, min_atoms=1)
    small = box * 0.6                       # 12 A box, 4 cells x 4.5 A won't fit
    nl = neighbors.build_neighbor_list_cell(x * 0.6, small, 4.5, 64, cells)
    assert bool(nl.overflow)


def test_rebuild_like_preserves_config():
    x, box = _random_box(250, 21.0, seed=5)
    cells = neighbors.suggest_cells(250, np.asarray(box), 5.0, min_atoms=1)
    nl = neighbors.build_neighbor_list_cell(x, box, 5.0, 48, cells)
    nl2 = neighbors.rebuild_like(nl, x, box, 5.0)
    assert nl2.cells == cells
    assert _pair_set(nl.idx) == _pair_set(nl2.idx)
    dense = neighbors.build_neighbor_list(x, box, 5.0, 48)
    dense2 = neighbors.rebuild_like(dense, x, box, 5.0)
    assert dense2.cells == ()
    assert _pair_set(dense.idx) == _pair_set(dense2.idx)


def test_md_step_with_cell_list_matches_dense(tmp_path):
    """A few NVE steps with the cell-list rebuild path give the same
    trajectory as with the dense build (the lists hold identical pairs)."""
    import jax
    from fixtures import make_water_box, write_fixture_files
    from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
    from reactive_pb_nn_md_tpu.io.topfile import read_top
    from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
    from reactive_pb_nn_md_tpu.topology import build_system, State
    from reactive_pb_nn_md_tpu.models import pme
    from reactive_pb_nn_md_tpu.md import integrators, velocities

    ff_p, top_p, sim_p = write_fixture_files(
        tmp_path, msevb="no", cutoff=4.0, verlet_cutoff=5.0, pme_grid=16)
    frame = make_water_box(124, include_h3o=False, seed=7)
    cfg = read_sim_params(sim_p)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    key = jax.random.PRNGKey(0)
    v = velocities.sample_velocities(
        jax.random.PRNGKey(1), system.mass, 300.0,
        velocities.freeze_mask(system, topo))
    state = State(x=jnp.asarray(frame.xyz), v=v,
                  box=jnp.asarray(frame.box), key=key,
                  step=jnp.asarray(0, jnp.int32))
    cbw = pme.cb_half(state.box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=state.x.dtype)
    cells = neighbors.suggest_cells(system.n_atoms, np.asarray(frame.box),
                                    system.verlet_cutoff, min_atoms=1)
    assert cells and cells[:3] >= (3, 3, 3)
    vol = float(np.prod(np.diag(frame.box)))
    cap = neighbors.suggest_capacity(system.n_atoms, vol,
                                     system.verlet_cutoff)

    results = {}
    for name, cfg_cells in [("dense", ()), ("cell", cells)]:
        ms = integrators.initial_md_state(state, topo, system, cbw, cap,
                                          cells=cfg_cells)
        assert not bool(ms.nbr_overflow)
        # force a mid-run rebuild through the lax.cond path: skin is small
        for _ in range(5):
            ms = integrators.md_step(ms, system, cbw, cfg.delta_t, "NVE")
        results[name] = (np.asarray(ms.state.x), float(ms.potential))
    np.testing.assert_allclose(results["dense"][0], results["cell"][0],
                               atol=1e-10)
    assert abs(results["dense"][1] - results["cell"][1]) < 1e-8


def test_suggest_cells_fallbacks():
    box = np.diag([20.0, 20.0, 20.0])
    assert neighbors.suggest_cells(100, box, 4.5, min_atoms=1024) == ()
    # fewer than 3 cells per axis -> dense
    assert neighbors.suggest_cells(5000, box, 8.0, min_atoms=1) == ()
    c = neighbors.suggest_cells(5000, box, 4.5, min_atoms=1)
    assert c[:3] == (4, 4, 4) and c[3] >= 5000 // 64


def test_react_adjacency_enumeration_equivalence():
    """Diabat enumeration over the short-cutoff reactive adjacency must be
    IDENTICAL (same states, same order) to the dense all-pairs search:
    evb_reactive_pair_distance < react_cutoff and rows are ascending-j."""
    import pathlib
    import tempfile
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from fixtures import make_water_box, write_fixture_files
    from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
    from reactive_pb_nn_md_tpu.io.topfile import read_top
    from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
    from reactive_pb_nn_md_tpu.topology import build_system
    from reactive_pb_nn_md_tpu.evb.enumerate import enumerate_diabats
    from reactive_pb_nn_md_tpu.utils.constants import \
        EVB_REACTIVE_PAIR_DISTANCE

    tmp = pathlib.Path(tempfile.mkdtemp())
    ff_p, top_p, sim_p = write_fixture_files(tmp, msevb="yes")
    cfg = read_sim_params(sim_p)
    frame = make_water_box(63, include_h3o=True, seed=11)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    x = jnp.asarray(frame.xyz)
    box = jnp.asarray(frame.box)
    skin = system.verlet_cutoff - system.real_space_cutoff
    react_cutoff = float(EVB_REACTIVE_PAIR_DISTANCE + skin)
    nlist = neighbors.build_neighbor_list(
        x, box, system.verlet_cutoff, 128,
        react_cutoff=react_cutoff, react_cap=48)
    assert not bool(nlist.overflow)
    assert nlist.react_idx is not None

    dense = enumerate_diabats(x, box, topo, system)
    rows = enumerate_diabats(x, box, topo, system,
                             full_idx=nlist.react_idx)
    assert int(dense.n_states) == int(rows.n_states)
    np.testing.assert_array_equal(np.asarray(dense.hop_log),
                                  np.asarray(rows.hop_log))
    np.testing.assert_array_equal(np.asarray(dense.parent),
                                  np.asarray(rows.parent))
    np.testing.assert_array_equal(np.asarray(dense.hydronium_of),
                                  np.asarray(rows.hydronium_of))


def test_cell_react_rows_sorted_and_match_dense():
    """The reactive adjacency from the CELL build must have ascending-j
    rows (-1 padding last) and the same row contents as the dense build --
    the diabat discovery order depends on it."""
    x, box = _random_box(400, 24.0, seed=5)
    cap = neighbors.suggest_capacity(400, 24.0 ** 3, 6.0, safety=2.0)
    rcut, rcap = 3.5, 24
    dense = neighbors.build_neighbor_list(x, box, 6.0, cap,
                                          react_cutoff=rcut, react_cap=rcap)
    cells = neighbors.suggest_cells(400, np.asarray(box), 6.0, min_atoms=1)
    cell = neighbors.build_neighbor_list_cell(x, box, 6.0, cap, cells,
                                              react_cutoff=rcut,
                                              react_cap=rcap)
    assert not bool(dense.overflow) and not bool(cell.overflow)
    d = np.asarray(dense.react_idx)
    c = np.asarray(cell.react_idx)
    for row_d, row_c in zip(d, c):
        vd = row_d[row_d >= 0]
        vc = row_c[row_c >= 0]
        assert list(vc) == sorted(vc), "cell react row not ascending"
        assert set(vd) == set(vc)
        # padding strictly after the valid prefix
        first_pad = len(vc)
        assert np.all(row_c[first_pad:] == -1)
    # dense rows are ascending by construction -> identical arrays
    np.testing.assert_array_equal(d, c)


def test_rows_on_demand_match_materialized():
    """At the build instant (stale == current positions) rows_on_demand
    must return exactly the materialized full rows: same sets, ascending
    j, padding last.  Also checks the finer react table and per-row
    overflow flags."""
    x, box = _random_box(400, 18.0, seed=11)
    cutoff, rcut = 6.0, 3.0
    cap = neighbors.suggest_capacity(400, 18.0 ** 3, cutoff)
    cells = neighbors.suggest_cells(400, np.asarray(box), cutoff,
                                    min_atoms=1)
    rcells = neighbors.suggest_cells(400, np.asarray(box), rcut,
                                     min_atoms=0)
    mat = neighbors.build_neighbor_list_cell(x, box, cutoff, cap, cells,
                                             react_cutoff=rcut, react_cap=24)
    od = neighbors.build_neighbor_list_cell(x, box, cutoff, cap, cells,
                                            react_cutoff=rcut, react_cap=24,
                                            build_half=False, on_demand=True,
                                            react_cells=rcells)
    assert not bool(mat.overflow) and not bool(od.overflow)
    assert od.full_idx.shape == (400, 0) and od.react_idx is None
    assert od.celltab is not None and od.react_tab is not None

    rng = np.random.default_rng(2)
    atoms = jnp.asarray(rng.choice(400, 53, replace=False).astype(np.int32))
    for ct, ref_rows in [(od.celltab, np.asarray(mat.full_idx)),
                         (od.react_tab, np.asarray(mat.react_idx))]:
        rows, over = neighbors.rows_on_demand(ct, x, box, atoms)
        assert not bool(over.any())
        got = np.asarray(rows)
        for k, a in enumerate(np.asarray(atoms)):
            vref = ref_rows[a][ref_rows[a] >= 0]
            vgot = got[k][got[k] >= 0]
            assert list(vgot) == sorted(vgot)
            assert set(vref) == set(vgot), (int(a), set(vref) ^ set(vgot))
            assert np.all(got[k][len(vgot):] == -1)

    # a too-small row capacity must flag the overflowing rows
    tight = od.celltab.replace(row_cap=2)
    _, over = neighbors.rows_on_demand(tight, x, box, atoms)
    assert bool(over.any())


def test_reactive_md_with_on_demand_rows_matches_dense(tmp_path):
    """Full reactive MD (MS-EVB enumeration + delta diagonals) through the
    on-demand cell-table adjacency gives the dense-build trajectory: the
    row SOURCES differ but the use-time distance masks make energies and
    forces identical."""
    import jax
    from fixtures import make_water_box, write_fixture_files
    from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
    from reactive_pb_nn_md_tpu.io.topfile import read_top
    from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
    from reactive_pb_nn_md_tpu.topology import build_system, State
    from reactive_pb_nn_md_tpu.models import pme
    from reactive_pb_nn_md_tpu.md import integrators, velocities

    ff_p, top_p, sim_p = write_fixture_files(
        tmp_path, msevb="yes", cutoff=4.0, verlet_cutoff=5.0, pme_grid=16)
    frame = make_water_box(124, include_h3o=True, seed=3)
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
    cells = neighbors.suggest_cells(system.n_atoms, np.asarray(frame.box),
                                    system.verlet_cutoff, min_atoms=1)
    assert cells
    vol = float(np.prod(np.diag(frame.box)))
    cap = neighbors.suggest_capacity(system.n_atoms, vol,
                                     system.verlet_cutoff)

    results = {}
    for name, cfg_cells in [("dense", ()), ("od", cells)]:
        ms = integrators.initial_md_state(state, topo, system, cbw, cap,
                                          cells=cfg_cells)
        if name == "od":
            # cells + ms_evb => the on-demand path must be active
            assert ms.nlist.celltab is not None
            assert ms.nlist.react_tab is not None
            assert ms.nlist.full_idx.shape[1] == 0
        assert not bool(ms.nbr_overflow)
        for _ in range(4):
            ms = integrators.md_step(ms, system, cbw, cfg.delta_t, "NVE")
        assert not bool(ms.nbr_overflow)
        results[name] = (np.asarray(ms.state.x), float(ms.potential),
                         int(ms.n_states))
    assert results["dense"][2] == results["od"][2]
    np.testing.assert_allclose(results["dense"][0], results["od"][0],
                               atol=1e-9)
    assert abs(results["dense"][1] - results["od"][1]) < 1e-6
