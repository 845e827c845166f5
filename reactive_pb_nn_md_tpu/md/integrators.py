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
class CompCarry:
    """Kahan compensation residuals for the integrator's x/v accumulators
    (present only when System.compensated_sum; None otherwise)."""
    x: jnp.ndarray                # (N,3) position-sum residual
    v: jnp.ndarray                # (N,3) velocity-sum residual


def two_sum_add(acc, delta, carry):
    """One compensated accumulation step: acc += delta with a running
    residual `carry` (Kahan/Neumaier form).  The optimization barrier pins
    the rounding of `acc + delta` so XLA's algebraic simplifier cannot
    cancel `(t - acc)` back to `delta` and zero the compensation."""
    d = delta + carry
    t = jax.lax.optimization_barrier(acc + d)
    return t, d - (t - acc)


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
    # per-diabat observability (print_evb_trajectory_data,
    # ms_evb.f90:3128-3162): acid molecule and solvation shell (hop count)
    # of every state in the set the eigenvector refers to
    hydronium_of: jnp.ndarray     # (S,) int32
    n_hops_of: jnp.ndarray        # (S,) int32
    # Kahan carries (None unless System.compensated_sum)
    comp: Optional[CompCarry] = None


def wrap_molecules(x, box, topo: Topology, mass, mt_mass=None):
    """Translate whole molecules back into the box by their COM
    (shift_molecules_into_box).  Returns (wrapped x, wrapped com): the
    per-molecule COM is needed again by the EVB layer (enumeration COM
    cutoff, Zundel PBC convention) -- computing it once per step removes
    the repeated (M, A) gathers the round-1 profile flagged."""
    from ..evb.enumerate import molecule_com
    com = molecule_com(x, topo, mass, box, mt_mass=mt_mass)
    frac = pbc.xyz_to_frac(com, box)
    shift = jax.lax.stop_gradient(jnp.floor(frac)) @ box    # (M, 3)
    return x - shift[topo.atom_mol], com - shift


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


@struct.dataclass
class ForceEval:
    """Result of one reactive / non-reactive force evaluation."""
    potential: jnp.ndarray
    breakdown: total_mod.EnergyBreakdown
    force: jnp.ndarray
    topo: Topology                # post-hop topology (unchanged if no hop)
    n_states: jnp.ndarray
    eigenvector: jnp.ndarray
    hopped: jnp.ndarray
    evb_overflow: jnp.ndarray
    hydronium_of: jnp.ndarray     # (S,) int32
    n_hops_of: jnp.ndarray        # (S,) int32
    # on-demand adjacency row-capacity overflow (cell path): folded into
    # the NEIGHBOR overflow flag by md_step (host regrows capacity)
    row_overflow: jnp.ndarray = None


def evaluate_forces(x, box, topo, system: System, nlist, cbw,
                    com=None) -> ForceEval:
    """Dispatch reactive / non-reactive force evaluation.

    com: optional precomputed per-molecule COM of (x, topo) -- threads the
    integrator's wrap_molecules COM into the EVB layer."""
    pairs = neighbors.neighbor_pairs(nlist)
    S = system.evb_max_states
    if system.ms_evb:
        # on-demand cell path: hand the EVB layer the persisted cell
        # tables instead of materialized (N, K) adjacencies
        full_src = (nlist.celltab if nlist.celltab is not None
                    else nlist.full_idx)
        react_src = (nlist.react_tab if nlist.react_tab is not None
                     else nlist.react_idx)
        res, batch = ham.adiabatic_energy_force(x, box, topo, system, pairs,
                                                cbw, full_idx=full_src,
                                                react_idx=react_src,
                                                com=com)
        new_topo = res.principle_topo
        hopped = res.new_hydronium != topo.hydronium_mol
        return ForceEval(potential=res.energy, breakdown=res.breakdown,
                         force=res.force, topo=new_topo,
                         n_states=res.n_states, eigenvector=res.eigenvector,
                         hopped=hopped, evb_overflow=res.overflow,
                         hydronium_of=res.hydronium_of,
                         n_hops_of=res.n_hops_of,
                         row_overflow=res.row_overflow)
    bd, force = total_mod.total_energy_and_forces(x, box, topo, system,
                                                  pairs, cbw)
    return ForceEval(potential=bd.total, breakdown=bd, force=force, topo=topo,
                     n_states=jnp.asarray(1, jnp.int32),
                     eigenvector=jnp.zeros((S,), x.dtype),
                     hopped=jnp.asarray(False),
                     evb_overflow=jnp.asarray(False),
                     hydronium_of=jnp.full((S,), -1, jnp.int32),
                     n_hops_of=jnp.zeros((S,), jnp.int32))


# initial_md_state's one-off force evaluation, compiled: in eager mode the
# reactive path is thousands of ops, and on a remote-tunnel TPU each eager
# op costs a ~28 ms dispatch round-trip (40+ min of pure dispatch at init).
# CPU keeps the eager path: its dispatch is free and tests would pay an
# extra compile per fixture otherwise.
_evaluate_forces_jit = jax.jit(evaluate_forces)


@functools.partial(jax.jit, static_argnames=("ensemble",))
def md_step(ms: MDState, system: System, cbw, dt: float, ensemble: str,
            friction: float = 0.1, temperature: float = 300.0,
            bias=None) -> MDState:
    state, topo = ms.state, ms.topo
    mass = system.mass[:, None]
    mobile = velocities.freeze_mask(system, topo)[:, None]
    conv = CONV_KJMOL_A2PS2GMOL

    def kick(v, f, key):
        if ensemble == "NVE" or ensemble == "NPT":
            return v + dt / 2.0 * f / mass * conv
        return langevin_half_kick(v, f, mass, key, dt, friction, temperature)

    key, k1, k2 = jax.random.split(state.key, 3)

    # compensated accumulation only applies to the plain (non-Langevin)
    # kick: the Langevin half-update is not a pure add and its noise floor
    # dwarfs fp32 rounding anyway
    compensated = system.compensated_sum and ensemble in ("NVE", "NPT")

    def masked_two_sum(acc, delta, carry):
        t, c = two_sum_add(acc, delta, carry)
        return jnp.where(mobile, t, acc), jnp.where(mobile, c, carry)

    # first half kick + drift
    if compensated:
        xc, vc = ms.comp.x, ms.comp.v
        v, vc = masked_two_sum(state.v, dt / 2.0 * ms.force / mass * conv, vc)
        x, xc = masked_two_sum(state.x, v * dt, xc)
    else:
        v = jnp.where(mobile, kick(state.v, ms.force, k1), state.v)
        x = jnp.where(mobile, state.x + v * dt, state.x)
    x, com = wrap_molecules(x, state.box, topo, system.mass,
                            mt_mass=system.mt.mass)

    # neighbor rebuild when displacements exceed the skin
    skin = system.verlet_cutoff - system.real_space_cutoff
    rebuild = neighbors.needs_rebuild(ms.nlist, x, state.box, skin)
    nlist = jax.lax.cond(
        rebuild,
        lambda: neighbors.rebuild_like(ms.nlist, x, state.box,
                                       system.verlet_cutoff),
        lambda: ms.nlist)

    fe = evaluate_forces(x, state.box, topo, system, nlist, cbw, com=com)
    force = fe.force
    potential = fe.potential
    if bias is not None:
        # umbrella restraint (md/bias.py): the bias force enters the same
        # half-kick as the physical force, and its energy is part of the
        # conserved quantity reported in `potential`
        from . import bias as bias_mod
        be, bf = bias_mod.bias_energy_force(x, state.box, bias)
        force = force + bf
        potential = potential + be

    # second half kick with new forces
    if compensated:
        v, vc = masked_two_sum(v, dt / 2.0 * force / mass * conv, vc)
        comp = CompCarry(x=xc, v=vc)
    else:
        v = jnp.where(mobile, kick(v, force, k2), v)
        comp = ms.comp
    force_overflow = jnp.any(jnp.abs(force) > 1.0e4)
    v = velocities.remove_com_momentum(v, system.mass, mobile[:, 0])

    ke = velocities.kinetic_energy(v, system.mass)
    # fused pair-kernel capacity check (same regrow path as the neighbor
    # list; XLA merges the binning with the kernel's own)
    nbr_over = nlist.overflow
    if fe.row_overflow is not None:
        # on-demand adjacency rows exceeded their capacity: same regrow
        nbr_over = nbr_over | fe.row_overflow
    from ..models.total import _use_rs_kernel
    if _use_rs_kernel(system, x.dtype):
        from ..ops.pallas.realspace_pair import rs_cell_overflow
        nbr_over = nbr_over | rs_cell_overflow(
            x, state.box, system.rs_cells, system.real_space_cutoff)
    from ..models.pme import _pallas_spread_active
    if system.pme_scap and _pallas_spread_active(x.dtype):
        from ..ops.pallas.pme_slab import pme_slab_overflow
        nbr_over = nbr_over | pme_slab_overflow(
            x, state.box, system.pme_grid, system.spline_order,
            system.pme_scap)
    new_state = State(x=x, v=v, box=state.box, key=key, step=state.step + 1)
    return MDState(state=new_state, topo=fe.topo, nlist=nlist, force=force,
                   potential=potential, breakdown=fe.breakdown, kinetic=ke,
                   n_states=fe.n_states, eigenvector=fe.eigenvector,
                   hopped=fe.hopped, force_overflow=force_overflow,
                   nbr_overflow=nbr_over, evb_overflow=fe.evb_overflow,
                   hydronium_of=fe.hydronium_of, n_hops_of=fe.n_hops_of,
                   comp=comp)


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
    # umbrella CV sample (md/bias.py); 0.0 when the scan runs unbiased
    cv: jnp.ndarray = 0.0


@functools.partial(jax.jit, static_argnames=("ensemble", "n_steps",
                                             "unroll"))
def md_scan(ms: MDState, system: System, cbw, dt: float, ensemble: str,
            n_steps: int, friction: float = 0.1,
            temperature: float = 300.0, bias=None, unroll: int = 1):
    """n_steps MD steps in ONE dispatched program (lax.scan).

    Device dispatch through the host costs ~30 ms on this TPU stack; the
    whole step is jittable, so scanning amortizes that to nothing.  Host
    interaction (logging, trajectory, checkpoint) happens once per chunk.

    unroll: lax.scan unroll factor -- gives XLA a 2-4 step fusion window
    against the many-small-op tail (measured on the 10^4-atom config,
    ROUND_NOTES r5) at the cost of a proportionally bigger program."""

    def body(ms, _):
        ms = md_step.__wrapped__(ms, system, cbw, dt, ensemble, friction,
                                 temperature, bias)
        if bias is not None:
            from . import bias as bias_mod
            cv = bias_mod.primary_cv(ms.state.x, ms.state.box, bias)
        else:
            cv = jnp.asarray(0.0, ms.potential.dtype)
        diag = ChunkDiagnostics(
            potential=ms.potential, kinetic=ms.kinetic,
            n_states=ms.n_states, hopped=ms.hopped,
            hydronium=ms.topo.hydronium_mol,
            max_ci2=jnp.max(ms.eigenvector ** 2),
            force_overflow=ms.force_overflow,
            nbr_overflow=ms.nbr_overflow,
            evb_overflow=ms.evb_overflow,
            cv=cv)
        return ms, diag

    return jax.lax.scan(body, ms, None, length=n_steps, unroll=unroll)


def initial_md_state(state: State, topo: Topology, system: System, cbw,
                     capacity: int, cells=None,
                     react_cap: int = None, react_cells=None,
                     bias=None) -> MDState:
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
        import numpy as _np
        skin = system.verlet_cutoff - system.real_space_cutoff
        react_cutoff = float(system.evb_reactive_pair_distance + skin)
        if react_cap is None:
            vol = abs(float(_np.linalg.det(_np.asarray(state.box))))
            react_cap = neighbors.suggest_capacity(
                system.n_atoms, vol, react_cutoff, safety=1.4)
    else:
        react_cap = 0
    # the fused Pallas pair kernel bins atoms itself: the (N, K) half list
    # has no consumer there, so skip its build-time compaction entirely
    from ..models.total import _use_rs_kernel
    build_half = not _use_rs_kernel(system, state.x.dtype)
    # cell path + MS-EVB: skip materializing the (N, K) full/react
    # adjacencies (their top_k over (N, 27*ccap) dominated the 10^4-atom
    # rebuild); persist the cell tables and extract rows on demand
    on_demand = bool(cells) and system.ms_evb
    if on_demand and react_cap and react_cells is None:
        react_cells = neighbors.suggest_cells(
            system.n_atoms, state.box, react_cutoff, min_atoms=0)
    react_cells = react_cells or ()
    nlist = neighbors.build_neighbors(state.x, state.box,
                                      system.verlet_cutoff, capacity, cells,
                                      react_cutoff=react_cutoff,
                                      react_cap=react_cap,
                                      build_half=build_half,
                                      on_demand=on_demand,
                                      react_cells=react_cells)
    eval_fn = (evaluate_forces if jax.default_backend() == "cpu"
               else _evaluate_forces_jit)
    fe = eval_fn(state.x, state.box, topo, system, nlist, cbw)
    if bias is not None:
        from . import bias as bias_mod
        be, bf = bias_mod.bias_energy_force(state.x, state.box, bias)
        fe = fe.replace(force=fe.force + bf, potential=fe.potential + be)
    ke = velocities.kinetic_energy(state.v, system.mass)
    comp = (CompCarry(x=jnp.zeros_like(state.x), v=jnp.zeros_like(state.v))
            if system.compensated_sum else None)
    nbr_over = nlist.overflow
    if fe.row_overflow is not None:
        nbr_over = nbr_over | fe.row_overflow
    return MDState(state=state, topo=fe.topo, nlist=nlist, force=fe.force,
                   potential=fe.potential, breakdown=fe.breakdown, kinetic=ke,
                   n_states=fe.n_states, eigenvector=fe.eigenvector,
                   hopped=fe.hopped, force_overflow=jnp.asarray(False),
                   nbr_overflow=nbr_over, evb_overflow=fe.evb_overflow,
                   hydronium_of=fe.hydronium_of, n_hops_of=fe.n_hops_of,
                   comp=comp)
