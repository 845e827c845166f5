"""Multi-device execution: replica ensembles and atom-sharded forces.

The reference's only parallelism is OpenMP within one process (SURVEY §2.3).
The TPU-native mapping:

  dp axis ("replica")  : independent MD replicas (umbrella windows,
                         temperature ladders) -- vmapped and sharded across
                         devices; zero communication except diagnostics.
  sp axis ("atoms")    : the atom/pair dimension sharded within a replica;
                         XLA inserts the all-gathers/psums for the pair
                         gathers and force reductions (GSPMD -- annotate
                         shardings, let the compiler place collectives on
                         ICI).

Both are expressed as sharding annotations over one jitted step: no
hand-written NCCL/MPI analog exists or is needed.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..md import integrators


def make_mesh(n_devices=None, sp=None):
    """1- or 2-axis device mesh ("replica", "atoms")."""
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if sp is None:
        sp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // sp
    return Mesh(np.asarray(devices).reshape(dp, sp), ("replica", "atoms"))


def stack_replicas(ms: integrators.MDState, n_replicas, base_key):
    """Tile one MDState into a replica batch with distinct PRNG keys."""
    keys = jax.random.split(base_key, n_replicas)

    def tile(a):
        return jnp.broadcast_to(a[None], (n_replicas,) + a.shape)

    batch = jax.tree_util.tree_map(tile, ms)
    batch = batch.replace(state=batch.state.replace(key=keys))
    return batch


def replica_sharding(mesh, ms_batch):
    """Shardings: replica axis on "replica"; atom-indexed arrays also shard
    their atom dimension on "atoms"."""
    n_atoms = ms_batch.state.x.shape[1]
    sp = mesh.shape["atoms"]

    def spec(a):
        # shard (R, N, ...) arrays over both axes when N divides evenly
        if a.ndim >= 2 and a.shape[1] == n_atoms and n_atoms % sp == 0:
            return NamedSharding(mesh, P("replica", "atoms"))
        return NamedSharding(mesh, P("replica"))

    return jax.tree_util.tree_map(spec, ms_batch)


def _no_tier(system):
    """Replica execution disables the two-tier state evaluation: under
    vmap a lax.cond lowers to both-branches-execute (select), so the
    escalation branch would run for EVERY replica on every step -- the
    tier would cost, not save.  Replicas run one static cap."""
    return system.replace(evb_small_states=0)


def make_replica_step(system, cbw, dt, ensemble, friction=0.1,
                      temperature=300.0):
    """Jitted, vmapped MD step over the replica axis."""
    system = _no_tier(system)

    def one(ms):
        return integrators.md_step.__wrapped__(
            ms, system, cbw, dt, ensemble, friction, temperature)

    return jax.jit(jax.vmap(one))


def make_replica_scan(system, cbw, dt, ensemble, n_steps, friction=0.1,
                      temperature=300.0):
    """Jitted scan of the vmapped MD step: R replicas advance n_steps in
    ONE dispatch.  This is the single-chip ensemble production shape (the
    reference's OpenMP replacement for independent umbrella windows /
    temperature ladders, SURVEY §2.3): a sub-1000-atom box underfills the
    chip, so aggregate throughput comes from batching replicas, not from
    sharding one tiny box."""
    system = _no_tier(system)

    def one(ms):
        return integrators.md_scan.__wrapped__(
            ms, system, cbw, dt, ensemble, n_steps, friction, temperature)

    return jax.jit(jax.vmap(one))


# ---------------------------------------------------------------------------
# single-replica atom sharding (the >=10^4-atom regime: one big box spread
# over the "atoms" mesh axis; XLA/GSPMD places the all-gathers for the pair
# gathers and the reduce/all-reduces for energies on ICI)
# ---------------------------------------------------------------------------

def atom_sharding(mesh, ms: integrators.MDState):
    """Shardings for ONE MDState (no replica axis): every array with a
    leading atom dimension is sharded over the "atoms" axis, everything
    else (molecule tables, box, scalars) is replicated."""
    n_atoms = ms.state.x.shape[0]
    sp = mesh.shape["atoms"]

    def spec(a):
        if a.ndim >= 1 and a.shape[0] == n_atoms and n_atoms % sp == 0:
            return NamedSharding(mesh, P("atoms"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, ms)


def make_atom_sharded_step(system, cbw, dt, ensemble, mesh, ms_example,
                           friction=0.1, temperature=300.0):
    """Jitted single-replica MD step with atom-dimension shardings pinned
    on inputs AND outputs (so the state stays sharded across steps instead
    of collapsing to replicated between dispatches)."""
    shardings = atom_sharding(mesh, ms_example)

    def one(ms):
        return integrators.md_step.__wrapped__(
            ms, system, cbw, dt, ensemble, friction, temperature)

    return jax.jit(one, in_shardings=(shardings,), out_shardings=shardings)


def make_atom_sharded_scan(system, cbw, dt, ensemble, mesh, ms_example,
                           n_steps, friction=0.1, temperature=300.0):
    """Jitted CHUNKED production loop (md_scan) with atom shardings pinned
    on inputs and outputs: the state enters sharded, every step of the
    scan body keeps the atom axis distributed (GSPMD propagates the
    annotation through the carry), and the state leaves sharded -- so
    chained dispatches never collapse to replicated between chunks.  This
    is the multi-chip production shape for >=10^4-atom boxes (SURVEY
    §2.3); certified by __graft_entry__.dryrun_multichip part 2."""
    shardings = atom_sharding(mesh, ms_example)

    def loop(ms):
        return integrators.md_scan.__wrapped__(
            ms, system, cbw, dt, ensemble, n_steps, friction, temperature)

    # diagnostics carry a leading n_steps axis -> replicated output spec
    return jax.jit(loop, in_shardings=(shardings,),
                   out_shardings=(shardings, None))


def collective_summary(compiled):
    """Count XLA collectives in a compiled executable's HLO -- proof of
    where GSPMD placed communication."""
    txt = compiled.as_text()
    counts = {}
    for name in ("all-gather", "all-reduce", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        n = txt.count(f" {name}")
        if n:
            counts[name] = n
    return counts
