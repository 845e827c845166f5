"""The compact-domain diabat-topology builder (the default) must reproduce
the sequential full-array apply_hop chain exactly -- every Topology field,
including multi-hop chains and back-transfer chains that revisit the
principle hydronium (duplicate chain molecules)."""

import jax
import jax.numpy as jnp
import numpy as np

from fixtures import make_water_box, write_fixture_files
from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
from reactive_pb_nn_md_tpu.io.topfile import read_top
from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
from reactive_pb_nn_md_tpu.topology import build_system
from reactive_pb_nn_md_tpu.evb.enumerate import enumerate_diabats
from reactive_pb_nn_md_tpu.evb.topology_ops import (
    build_diabat_topologies, build_diabat_topologies_sequential)


def _water_system(tmp_path, n_water=63, seed=7):
    ff_p, top_p, sim_p = write_fixture_files(tmp_path, msevb="yes")
    cfg = read_sim_params(sim_p)
    frame = make_water_box(n_water, include_h3o=True, seed=seed)
    system, topo = build_system(frame, read_ffpmt(ff_p), read_top(top_p),
                                cfg)
    return system, topo, jnp.asarray(frame.xyz), jnp.asarray(frame.box)


def _assert_batches_equal(ref, new, n):
    for name in ("mol_mtype", "mol_natom", "mol_atoms", "atom_mol",
                 "atom_slot", "atom_type", "charge", "hydronium_mol"):
        a = np.asarray(getattr(ref.topo, name))[:n]
        b = np.asarray(getattr(new.topo, name))[:n]
        np.testing.assert_array_equal(a, b, err_msg=name)
    np.testing.assert_array_equal(np.asarray(ref.changed_atoms),
                                  np.asarray(new.changed_atoms))
    np.testing.assert_array_equal(np.asarray(ref.changed_mask),
                                  np.asarray(new.changed_mask))


def test_compact_equals_sequential_water(tmp_path):
    system, topo, x, box = _water_system(tmp_path)
    dset = enumerate_diabats(x, box, topo, system)
    n = int(dset.n_states)
    assert n > 3
    # the chains must include multi-hop states (and typically back-transfer
    # chains with duplicate molecules) for this to exercise canonicalization
    assert int(jnp.max(dset.n_hops)) >= 2

    ref = build_diabat_topologies_sequential(topo, dset, system)
    new = build_diabat_topologies(topo, dset, system)
    _assert_batches_equal(ref, new, n)

    # jit parity too (the hot path runs jitted)
    newj = jax.jit(build_diabat_topologies, static_argnums=())(
        topo, dset, system)
    _assert_batches_equal(ref, newj, n)


def test_compact_back_transfer_chain(tmp_path):
    """Explicitly exercise a chain that revisits the principle hydronium:
    m0 -> m1 -> m0 (duplicate chain molecule, canonical-row path)."""
    system, topo, x, box = _water_system(tmp_path, n_water=26, seed=3)
    dset = enumerate_diabats(x, box, topo, system)
    n = int(dset.n_states)
    hyd = int(topo.hydronium_mol)
    back = [s for s in range(1, n)
            if int(dset.n_hops[s]) >= 2
            and int(dset.hop_log[s, int(dset.n_hops[s]) - 1, 3]) == hyd]
    assert back, "no back-transfer chain found in the fixture"
    ref = build_diabat_topologies_sequential(topo, dset, system)
    new = build_diabat_topologies(topo, dset, system)
    _assert_batches_equal(ref, new, n)
