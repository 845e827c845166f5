"""MS-EVB layer tests: enumeration, diabat topology invariants, Hamiltonian
symmetry, and finite-difference verification of the Hellmann-Feynman forces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_water_box, write_fixture_files, h3o_geometry
from reactive_pb_nn_md_tpu.io.gro import GroFrame
from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
from reactive_pb_nn_md_tpu.io.topfile import read_top
from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
from reactive_pb_nn_md_tpu.topology import build_system
from reactive_pb_nn_md_tpu.models import pme
from reactive_pb_nn_md_tpu.ops import neighbors
from reactive_pb_nn_md_tpu.evb.enumerate import enumerate_diabats
from reactive_pb_nn_md_tpu.evb.topology_ops import build_diabat_topologies
from reactive_pb_nn_md_tpu.evb import hamiltonian as ham


def _setup(tmp_path_factory, n_water=63, seed=7, **kw):
    tmp = tmp_path_factory.mktemp("evb")
    ff_p, top_p, sim_p = write_fixture_files(tmp, msevb="yes", **kw)
    cfg = read_sim_params(sim_p)
    frame = make_water_box(n_water, include_h3o=True, seed=seed)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p), cfg)
    x = jnp.asarray(frame.xyz)
    box = jnp.asarray(frame.box)
    cap = neighbors.suggest_capacity(system.n_atoms,
                                     float(np.prod(np.diag(frame.box))),
                                     system.verlet_cutoff)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, cap)
    pairs = neighbors.neighbor_pairs(nlist)
    cbw = pme.cb_half(box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=x.dtype)
    return system, topo, x, box, pairs, cbw


@pytest.fixture(scope="module")
def evb_setup(tmp_path_factory):
    return _setup(tmp_path_factory)


def test_enumeration(evb_setup):
    system, topo, x, box, pairs, cbw = evb_setup
    dset = enumerate_diabats(x, box, topo, system)
    n = int(dset.n_states)
    assert not bool(dset.overflow)
    assert n >= 2, "hydronium in water must find at least one acceptor"
    # state 0 = principle
    assert int(dset.n_hops[0]) == 0
    assert int(dset.hydronium_of[0]) == int(topo.hydronium_mol)
    # every other active state has a parent and a consistent chain
    for s in range(1, n):
        p = int(dset.parent[s])
        assert 0 <= p < n
        assert int(dset.n_hops[s]) == int(dset.n_hops[p]) + 1
        hops = np.asarray(dset.hop_log[s])
        # first donor is the principle hydronium
        assert hops[0, 0] == int(topo.hydronium_mol)
        for h in range(int(dset.n_hops[s])):
            donor, proton, heavy, acc, acc_atom = hops[h]
            assert donor >= 0 and acc >= 0 and donor != acc
            # proton belongs to the donor in principle topology only for
            # h == 0; for secondary hops it belongs to the hop's donor
            assert int(topo.atom_mol[proton]) == donor
            assert int(topo.atom_mol[acc_atom]) == acc


def test_diabat_topology_invariants(evb_setup):
    system, topo, x, box, pairs, cbw = evb_setup
    dset = enumerate_diabats(x, box, topo, system)
    batch = build_diabat_topologies(topo, dset, system)
    n = int(dset.n_states)
    mt = system.mt
    total_charge = float(jnp.sum(topo.charge))

    for s in range(min(n, 8)):
        t = jax.tree_util.tree_map(lambda a: a[s], batch.topo)
        # charge conservation
        np.testing.assert_allclose(float(jnp.sum(t.charge)), total_charge,
                                   atol=1e-10)
        # hydronium is the chain's final acceptor
        assert int(t.hydronium_mol) == int(dset.hydronium_of[s])
        # per-molecule consistency
        mol_atoms = np.asarray(t.mol_atoms)
        mol_mtype = np.asarray(t.mol_mtype)
        natom = np.asarray(t.mol_natom)
        atom_type = np.asarray(t.atom_type)
        atom_mol = np.asarray(t.atom_mol)
        atom_slot = np.asarray(t.atom_slot)
        tmpl = np.asarray(mt.atype)
        seen = set()
        for m in range(system.n_mole):
            na = natom[m]
            assert na == int(mt.natom[mol_mtype[m]])
            for i in range(na):
                g = mol_atoms[m, i]
                assert g >= 0 and g not in seen
                seen.add(g)
                assert atom_mol[g] == m
                assert atom_slot[g] == i
                # atom types match the molecule-type template slotwise
                assert atom_type[g] == tmpl[mol_mtype[m], i], \
                    f"state {s} mol {m} slot {i}"
            assert np.all(mol_atoms[m, na:] == -1)
        assert len(seen) == system.n_atoms


@pytest.mark.smoke
def test_diag_matches_full_recompute(evb_setup):
    """Base-grid + delta-Q reciprocal energy must equal a from-scratch PME
    of the diabat's own charges."""
    from reactive_pb_nn_md_tpu.models import total as total_mod
    system, topo, x, box, pairs, cbw = evb_setup
    dset = enumerate_diabats(x, box, topo, system)
    batch = build_diabat_topologies(topo, dset, system)
    diag, bds, e_recip = ham.diabat_diagonal_energies_full(
        x, box, batch, system, pairs, cbw, topo.charge)
    n = int(dset.n_states)
    for s in range(min(n, 4)):
        t = jax.tree_util.tree_map(lambda a: a[s], batch.topo)
        Q = pme.charge_grid(x, t.charge, box, system.pme_grid,
                            system.spline_order)
        e_direct = float(pme.recip_energy(Q, cbw))
        np.testing.assert_allclose(float(e_recip[s]), e_direct, rtol=1e-10)


def test_adiabatic_energy_below_diabats(evb_setup):
    system, topo, x, box, pairs, cbw = evb_setup
    res, batch = ham.adiabatic_energy_force(x, box, topo, system, pairs, cbw)
    H = np.asarray(res.hamiltonian)
    n = int(res.n_states)
    assert not bool(res.overflow)
    # variational: ground state at or below the lowest diagonal
    assert float(res.energy) <= H[:n].diagonal().min() + 1e-9
    # eigenvector normalized over active states
    c = np.asarray(res.eigenvector)
    np.testing.assert_allclose(np.sum(c[:n] ** 2), 1.0, atol=1e-10)
    assert np.all(np.abs(c[n:]) < 1e-10)


def test_finite_difference_adiabatic_forces(evb_setup):
    system, topo, x, box, pairs, cbw = evb_setup

    def efun(xx):
        res, _ = ham.adiabatic_energy_force(xx, box, topo, system, pairs, cbw)
        return res

    res = efun(x)
    force = np.asarray(res.force)
    assert np.all(np.isfinite(force))

    rng = np.random.default_rng(1)
    h = 2e-6
    # test hydronium atoms (EVB-specific forces) + random solvent atoms
    h_mol = int(topo.hydronium_mol)
    h_atoms = [int(a) for a in np.asarray(topo.mol_atoms[h_mol]) if a >= 0]
    candidates = h_atoms + [int(rng.integers(0, system.n_atoms))
                            for _ in range(3)]
    for a in candidates:
        d = int(rng.integers(0, 3))
        dx = np.zeros((system.n_atoms, 3))
        dx[a, d] = h
        ep = float(efun(x + jnp.asarray(dx)).energy)
        em = float(efun(x - jnp.asarray(dx)).energy)
        fd = -(ep - em) / (2 * h)
        np.testing.assert_allclose(force[a, d], fd, rtol=5e-5, atol=5e-5)


def test_vex_mol_major_equals_atom_major(evb_setup):
    """The molecule-major exchange-electrostatics path (base molecule pack
    + hop-chain correction, coupling._vex_mol_major) must reproduce the
    atom-major per-state sweep exactly -- including multi-hop states whose
    mid-chain molecules carry diabat charges but count as solvent."""
    from reactive_pb_nn_md_tpu.evb.enumerate import molecule_com
    system, topo, x, box, pairs, cbw = evb_setup
    dset = enumerate_diabats(x, box, topo, system)
    assert int(jnp.max(dset.n_hops)) >= 2, "need a multi-hop chain"
    batch = build_diabat_topologies(topo, dset, system)
    com0 = molecule_com(x, topo, system.mass, box)
    ref = ham.coupling_elements(x, box, batch, system, com0)
    fast = ham.coupling_elements(x, box, batch, system, com0,
                                 topo0=topo, base_charge=topo.charge)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-9, atol=1e-9)


def test_boundary_crossing_invariance(evb_setup):
    """Translating the system so the hydronium straddles the periodic
    boundary must not change the adiabatic surface: diabat topologies with
    molecules split across the boundary are handled by minimum-image
    bonded/intra/coupling terms (the reference instead re-wraps per-diabat
    coordinate copies, make_molecule_whole ms_evb.f90:876)."""
    system, topo, x, box, pairs, cbw = evb_setup
    res0, _ = ham.adiabatic_energy_force(x, box, topo, system, pairs, cbw)

    # translate the hydronium oxygen onto the box corner
    h = int(topo.hydronium_mol)
    o_atom = int(topo.mol_atoms[h, 0])
    shift = jnp.asarray(np.asarray(box)[0] * 0.5
                        + np.asarray(box)[1] * 0.5) - x[o_atom]
    from reactive_pb_nn_md_tpu.utils import pbc as pbcmod
    x2 = pbcmod.wrap_into_box(x + shift, box)
    nlist2 = neighbors.build_neighbor_list(x2, box, system.verlet_cutoff,
                                           200)
    pairs2 = neighbors.neighbor_pairs(nlist2)
    res2, batch2 = ham.adiabatic_energy_force(x2, box, topo, system, pairs2,
                                              cbw)

    assert int(res2.n_states) == int(res0.n_states)
    # prove the path is exercised: some diabat molecule must be split
    # across the boundary in raw coordinates
    L = float(np.asarray(box)[0, 0])
    split = False
    for s in range(1, int(res2.n_states)):
        t = jax.tree_util.tree_map(lambda a: a[s], batch2.topo)
        for m in np.unique(np.asarray(dset_mols(t))):
            atoms = [a for a in np.asarray(t.mol_atoms[m]) if a >= 0]
            ext = np.asarray(x2)[atoms].max(0) - np.asarray(x2)[atoms].min(0)
            if np.any(ext > L / 2):
                split = True
    assert split, "translated configuration exercises no split molecule"

    # a wrong (non-minimum-image) bonded/intra term for a split molecule
    # would be off by hundreds of kJ/mol; cutoff-crossing truncation noise
    # for a large rigid translation is O(0.3) (one LJ pair at the cutoff)
    np.testing.assert_allclose(float(res2.energy), float(res0.energy),
                               atol=1.0)
    H0 = np.asarray(res0.hamiltonian)
    H2 = np.asarray(res2.hamiltonian)
    n = int(res0.n_states)
    np.testing.assert_allclose(np.diag(H2)[:n], np.diag(H0)[:n], atol=1.0)


def dset_mols(t):
    """Molecules owning a transferred proton in this diabat (hydronium +
    everything whose natom differs from... simply: all molecules)."""
    import numpy as _np
    return _np.arange(t.mol_mtype.shape[0])


@pytest.mark.smoke
def test_symmetric_zundel(tmp_path_factory):
    """H5O2+ with mirror symmetry: two diabats, equal diagonals, |c| equal."""
    tmp = tmp_path_factory.mktemp("zundel")
    ff_p, top_p, sim_p = write_fixture_files(tmp, msevb="yes", cutoff=4.0,
                                             verlet_cutoff=5.0, alpha=0.7,
                                             pme_grid=32)
    cfg = read_sim_params(sim_p)

    # geometry: O-H*-O linear, proton exactly midway; each O has two other
    # H's arranged mirror-symmetrically
    roo = 2.4
    o1 = np.array([0.0, 0.0, 0.0])
    o2 = np.array([roo, 0.0, 0.0])
    hb = np.array([roo / 2, 0.0, 0.0])
    # hydronium = o1 + its 2 spectator H + shared H (slot order O,H,H,H)
    ha1 = o1 + np.array([-0.45, 0.82, 0.0])
    ha2 = o1 + np.array([-0.45, -0.82, 0.0])
    hb1 = o2 + np.array([0.45, 0.82, 0.0])
    hb2 = o2 + np.array([0.45, -0.82, 0.0])
    xyz = np.stack([o2, hb1, hb2, o1, ha1, ha2, hb])
    center = np.full(3, 6.0)
    xyz = xyz - xyz[3] + center
    L = 12.0

    frame = GroFrame(
        title="zundel", mol_names=["h2o", "h3o"],
        mol_first_atom=np.array([0, 3], dtype=np.int32),
        mol_natom=np.array([3, 4], dtype=np.int32),
        atom_names=["OW", "HW", "HW", "O_h3o", "H_h3o", "H_h3o", "H_h3o"],
        xyz=xyz, box=np.eye(3) * L)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p), cfg)
    x = jnp.asarray(xyz)
    box = jnp.asarray(frame.box)
    nlist = neighbors.build_neighbor_list(x, box, system.verlet_cutoff, 6)
    pairs = neighbors.neighbor_pairs(nlist)
    cbw = pme.cb_half(box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=x.dtype)

    res, batch = ham.adiabatic_energy_force(x, box, topo, system, pairs, cbw)
    H = np.asarray(res.hamiltonian)
    n = int(res.n_states)
    assert n == 2
    # the PME grid breaks exact mirror symmetry at the interpolation-error
    # level (~1e-4 kJ/mol here); everything else is symmetric
    np.testing.assert_allclose(H[0, 0], H[1, 1], rtol=1e-5)
    assert abs(H[0, 1]) > 1.0
    c = np.asarray(res.eigenvector)
    np.testing.assert_allclose(abs(c[0]), abs(c[1]), rtol=1e-3)
    # 2x2 ground state
    mean = 0.5 * (H[0, 0] + H[1, 1])
    split = np.sqrt((0.5 * (H[0, 0] - H[1, 1])) ** 2 + H[0, 1] ** 2)
    np.testing.assert_allclose(float(res.energy), mean - split, rtol=1e-9)


def test_enumeration_cutoffs_are_runtime_keys(tmp_path_factory):
    """evb_first_solvation_cutoff / evb_reactive_pair_distance are sim keys
    (reference compile-time constants glob_v.f90:54-55): tightening them
    shrinks the enumerated state set, defaults reproduce the default set,
    and an unsafe pair distance (> real_space_cutoff) is rejected."""
    counts = {}
    for name, extra in [
            ("default", ""),
            ("explicit-default", "evb_first_solvation_cutoff  5.0\n"
                                 "evb_reactive_pair_distance  2.5\n"),
            ("tight", "evb_first_solvation_cutoff  3.2\n"
                      "evb_reactive_pair_distance  1.4\n")]:
        tmp = tmp_path_factory.mktemp(f"cut_{name}")
        ff_p, top_p, sim_p = write_fixture_files(tmp, msevb="yes",
                                                 extra=extra)
        cfg = read_sim_params(sim_p)
        frame = make_water_box(63, include_h3o=True, seed=7)
        system, topo = build_system(frame, read_ffpmt(ff_p),
                                    read_top(top_p), cfg)
        dset = enumerate_diabats(jnp.asarray(frame.xyz),
                                 jnp.asarray(frame.box), topo, system)
        counts[name] = int(dset.n_states)
    assert counts["explicit-default"] == counts["default"]
    # 1.4 A excludes every O-H hop candidate at equilibrium O..H ~ 1.5+ A
    # in this rattled lattice; the set collapses toward the principle state
    assert counts["tight"] < counts["default"]

    tmp = tmp_path_factory.mktemp("cut_bad")
    ff_p, top_p, sim_p = write_fixture_files(
        tmp, msevb="yes", extra="evb_reactive_pair_distance  9.0\n")
    with pytest.raises(ValueError, match="real_space_cutoff"):
        read_sim_params(sim_p)


def test_two_tier_state_evaluation(tmp_path_factory):
    """The two-tier lax.cond evaluation (hamiltonian.small_state_tier) is
    exact: with the small tier big enough (small branch taken) AND with it
    forced tiny (escalation branch taken), energy/forces/eigenvector match
    the monolithic single-cap pipeline."""
    system, topo, x, box, pairs, cbw = _setup(
        tmp_path_factory, extra="evb_max_states   32\n")
    ref, _ = ham.adiabatic_energy_force(
        x, box, topo, system.replace(evb_small_states=0), pairs, cbw)
    n = int(ref.n_states)
    assert 2 < n < 32

    for s1, label in [(n + 2, "small branch"), (2, "escalation branch")]:
        sys_t = system.replace(evb_small_states=s1)
        assert ham.small_state_tier(sys_t) == s1
        res, batch = ham.adiabatic_energy_force(x, box, topo, sys_t,
                                                pairs, cbw)
        assert int(res.n_states) == n, label
        assert not bool(res.overflow), label
        np.testing.assert_allclose(float(res.energy), float(ref.energy),
                                   rtol=1e-12, err_msg=label)
        np.testing.assert_allclose(np.asarray(res.force),
                                   np.asarray(ref.force),
                                   atol=1e-9, err_msg=label)
        np.testing.assert_allclose(np.asarray(res.eigenvector[:n]),
                                   np.asarray(ref.eigenvector[:n]),
                                   atol=1e-9, err_msg=label)
        # the integrator's post-hop topology gather must see live rows
        t_p = jax.tree_util.tree_map(lambda a: a[int(res.principle)],
                                     batch.topo)
        assert int(t_p.hydronium_mol) == int(res.new_hydronium), label

    # auto tier is backend-gated: off on CPU (this test runs on CPU), 48
    # at cap >= 64 on accelerators; explicit values are honored anywhere
    assert ham.small_state_tier(system.replace(evb_max_states=80)) == 0
    assert ham.small_state_tier(system) == 0  # S=32 < 64: auto off
    assert ham.small_state_tier(
        system.replace(evb_max_states=80, evb_small_states=40)) == 40
