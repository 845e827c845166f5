"""MD step functions: velocity-Verlet NVE and Langevin-leapfrog NVT.

One fully-jitted step = (kick, drift, wrap, [rebuild neighbors], force,
kick, COM-momentum cleanup), mirroring md_integrate_atomic
(md_integration.f90:438-541).  In reactive mode the force evaluation is the
MS-EVB adiabatic surface and the step also performs the principle-diabat
topology switch (the reference's evb_change_diabat_data_structure_topology
+ Verlet rebuild, ms_evb.f90:218-227 -- here the neighbor list is
topology-independent, so no rebuild is needed on a hop).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..topology import System, Topology, State
from ..models import total as total_mod
from ..models import pme
from ..ops import neighbors
from ..evb import hamiltonian as ham
from ..utils import pbc
from ..utils.constants import CONV_KJMOL_A2PS2GMOL, KB
from . import velocities


@struct.dataclass
class MDState:
    state: State
    topo: Topology
    nlist: neighbors.NeighborList
    force: jnp.ndarray
    potential: jnp.ndarray
    breakdown: total_mod.EnergyBreakdown
    kinetic: jnp.ndarray
    # EVB diagnostics (zeros in non-reactive mode)
    n_states: jnp.ndarray
    eigenvector: jnp.ndarray
    hopped: jnp.ndarray           # () bool: hydronium changed this step
    force_overflow: jnp.ndarray   # () bool: |F| > 1e4 abort condition
    nbr_overflow: jnp.ndarray
    # () bool: diabat enumeration hit evb_max_states (truncated state set,
    # the analog of the reference's hard stop at ms_evb.f90:3107-3123)
    evb_overflow: jnp.ndarray


def wrap_molecules(x, box, topo: Topology, mass):
    """Translate whole molecules back into the box by their COM
    (shift_molecules_into_box)."""
    from ..evb.enumerate import molecule_com
    com = molecule_com(x, topo, mass, box)
    frac = pbc.xyz_to_frac(com, box)
    shift = jax.lax.stop_gradient(jnp.floor(frac)) @ box    # (M, 3)
    return x - shift[topo.atom_mol]


def langevin_half_kick(v, f, mass_col, key, dt, friction, temperature):
    """Langevin leapfrog half-update (langevin_integrator,
    md_integration.f90:186-228, OpenMM convention).  Applied twice per step;
    the two half-updates together have exactly the stationary variance
    kT conv / m per component."""
    conv = CONV_KJMOL_A2PS2GMOL
    g = jax.random.normal(key, v.shape, v.dtype)
    decay = jnp.exp(-friction * dt / 2.0)
    return (decay * v + (1.0 - decay) / friction * f / mass_col * conv
            + jnp.sqrt(2.0 * KB * temperature * friction * conv / mass_col)
            * jnp.sqrt((1.0 - jnp.exp(-friction * dt)) / (2.0 * friction))
            * g)


def evaluate_forces(x, box, topo, system: System, nlist, cbw):
    """Dispatch reactive / non-reactive force evaluation.

    Returns (potential, breakdown, force, new_topo, diagnostics)."""
    pairs = neighbors.neighbor_pairs(nlist)
    S = system.evb_max_states
    if system.ms_evb:
        res, batch = ham.adiabatic_energy_force(x, box, topo, system, pairs,
                                                cbw, full_idx=nlist.full_idx,
                                                react_idx=nlist.react_idx)
        new_topo = jax.tree_util.tree_map(
            lambda a: a[res.principle], batch.topo)
        hopped = res.new_hydronium != topo.hydronium_mol
        return (res.energy, res.breakdown, res.force, new_topo,
                res.n_states, res.eigenvector, hopped, res.overflow)
    bd, force = total_mod.total_energy_and_forces(x, box, topo, system,
                                                  pairs, cbw)
    return (bd.total, bd, force, topo, jnp.asarray(1, jnp.int32),
            jnp.zeros((S,), x.dtype), jnp.asarray(False),
            jnp.asarray(False))


@functools.partial(jax.jit, static_argnames=("ensemble",))
def md_step(ms: MDState, system: System, cbw, dt: float, ensemble: str,
            friction: float = 0.1, temperature: float = 300.0) -> MDState:
    state, topo = ms.state, ms.topo
    mass = system.mass[:, None]
    mobile = velocities.freeze_mask(system, topo)[:, None]
    conv = CONV_KJMOL_A2PS2GMOL

    def kick(v, f, key):
        if ensemble == "NVE" or ensemble == "NPT":
            return v + dt / 2.0 * f / mass * conv
        return langevin_half_kick(v, f, mass, key, dt, friction, temperature)

    key, k1, k2 = jax.random.split(state.key, 3)

    # first half kick + drift
    v = jnp.where(mobile, kick(state.v, ms.force, k1), state.v)
    x = jnp.where(mobile, state.x + v * dt, state.x)
    x = wrap_molecules(x, state.box, topo, system.mass)

    # neighbor rebuild when displacements exceed the skin
    skin = system.verlet_cutoff - system.real_space_cutoff
    rebuild = neighbors.needs_rebuild(ms.nlist, x, state.box, skin)
    nlist = jax.lax.cond(
        rebuild,
        lambda: neighbors.rebuild_like(ms.nlist, x, state.box,
                                       system.verlet_cutoff),
        lambda: ms.nlist)

    (pot, bd, force, new_topo, n_states, eigvec, hopped,
     evb_over) = evaluate_forces(x, state.box, topo, system, nlist, cbw)

    # second half kick with new forces
    v = jnp.where(mobile, kick(v, force, k2), v)
    force_overflow = jnp.any(jnp.abs(force) > 1.0e4)
    v = velocities.remove_com_momentum(v, system.mass, mobile[:, 0])

    ke = velocities.kinetic_energy(v, system.mass)
    new_state = State(x=x, v=v, box=state.box, key=key, step=state.step + 1)
    return MDState(state=new_state, topo=new_topo, nlist=nlist, force=force,
                   potential=pot, breakdown=bd, kinetic=ke,
                   n_states=n_states, eigenvector=eigvec, hopped=hopped,
                   force_overflow=force_overflow,
                   nbr_overflow=nlist.overflow, evb_overflow=evb_over)


@struct.dataclass
class ChunkDiagnostics:
    """Per-step scalars stacked over a scanned chunk (tiny host transfer)."""
    potential: jnp.ndarray
    kinetic: jnp.ndarray
    n_states: jnp.ndarray
    hopped: jnp.ndarray
    hydronium: jnp.ndarray
    max_ci2: jnp.ndarray
    force_overflow: jnp.ndarray
    nbr_overflow: jnp.ndarray
    evb_overflow: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("ensemble", "n_steps"))
def md_scan(ms: MDState, system: System, cbw, dt: float, ensemble: str,
            n_steps: int, friction: float = 0.1,
            temperature: float = 300.0):
    """n_steps MD steps in ONE dispatched program (lax.scan).

    Device dispatch through the host costs ~30 ms on this TPU stack; the
    whole step is jittable, so scanning amortizes that to nothing.  Host
    interaction (logging, trajectory, checkpoint) happens once per chunk."""

    def body(ms, _):
        ms = md_step.__wrapped__(ms, system, cbw, dt, ensemble, friction,
                                 temperature)
        diag = ChunkDiagnostics(
            potential=ms.potential, kinetic=ms.kinetic,
            n_states=ms.n_states, hopped=ms.hopped,
            hydronium=ms.topo.hydronium_mol,
            max_ci2=jnp.max(ms.eigenvector ** 2),
            force_overflow=ms.force_overflow,
            nbr_overflow=ms.nbr_overflow,
            evb_overflow=ms.evb_overflow)
        return ms, diag

    return jax.lax.scan(body, ms, None, length=n_steps)


def initial_md_state(state: State, topo: Topology, system: System, cbw,
                     capacity: int, cells=None,
                     react_cap: int = None) -> MDState:
    if cells is None:
        cells = neighbors.suggest_cells(system.n_atoms, state.box,
                                        system.verlet_cutoff)
    # reactive systems also get the short-cutoff adjacency for the
    # hop-candidate search: evb_reactive_pair_distance + the full skin
    # (the list stays valid exactly as long as the main list does).
    # react_cap can be passed explicitly (the simulation driver grows it
    # on overflow, like the main capacity).
    react_cutoff = 0.0
    if system.ms_evb:
        from ..utils.constants import EVB_REACTIVE_PAIR_DISTANCE
        import numpy as _np
        skin = system.verlet_cutoff - system.real_space_cutoff
        react_cutoff = float(EVB_REACTIVE_PAIR_DISTANCE + skin)
        if react_cap is None:
            vol = abs(float(_np.linalg.det(_np.asarray(state.box))))
            react_cap = neighbors.suggest_capacity(
                system.n_atoms, vol, react_cutoff, safety=1.4)
    else:
        react_cap = 0
    nlist = neighbors.build_neighbors(state.x, state.box,
                                      system.verlet_cutoff, capacity, cells,
                                      react_cutoff=react_cutoff,
                                      react_cap=react_cap)
    (pot, bd, force, new_topo, n_states, eigvec, hopped,
     evb_over) = evaluate_forces(state.x, state.box, topo, system, nlist,
                                 cbw)
    ke = velocities.kinetic_energy(state.v, system.mass)
    return MDState(state=state, topo=new_topo, nlist=nlist, force=force,
                   potential=pot, breakdown=bd, kinetic=ke,
                   n_states=n_states, eigenvector=eigvec, hopped=hopped,
                   force_overflow=jnp.asarray(False),
                   nbr_overflow=nlist.overflow, evb_overflow=evb_over)
