"""EVB Hamiltonian assembly, diagonalization and Hellmann-Feynman forces.

TPU-first reformulation of construct_evb_hamiltonian /
diagonalize_evb_hamiltonian (ms_evb.f90:181-490):

  * diagonal elements: the per-diabat total energy vmapped over the padded
    state batch.  Reciprocal PME uses one base Q grid plus per-diabat
    delta-Q scatters of only the changed atoms (the TPU analog of the
    reference's incremental modify_Q_grid trick, pme.f90:275-335), then ONE
    batched FFT over all diabats (vs the OpenMP loop over MKL FFTs at
    ms_evb.f90:2019-2090).
  * off-diagonal couplings vmapped over states (parent structure from the
    enumeration).
  * ground state from jnp.linalg.eigh on the padded matrix (inactive states
    parked at a huge, non-degenerate diagonal).
  * forces: F = -d/dx [ c^T H(x) c ] with c = stop_gradient(ground
    eigenvector) -- the Hellmann-Feynman theorem by construction, replacing
    the reference's per-element force store + recursive back-mapping
    (evb_store_forces, ms_evb.f90:2523-2656).
"""

import jax
import jax.numpy as jnp
from flax import struct

from ..topology import System, Topology
from ..models import total as total_mod
from ..models import pme, coupling, repulsion
from .enumerate import enumerate_diabats, DiabatSet
from .topology_ops import build_diabat_topologies, DiabatBatch

INACTIVE_DIAG = 1.0e8


def diabat_diagonal_energies(x, box, batch: DiabatBatch, system: System,
                             pairs, cbw, base_charge):
    """All H_ii in one batched evaluation."""
    S = system.evb_max_states
    K = system.pme_grid

    def one(topo_d, changed, cmask):
        bd = total_mod.energy_no_recip(x, box, topo_d, system, pairs)
        e_rep = repulsion.ms_evb_repulsion(x, box, topo_d, system)
        e_ref = repulsion.reference_energy(topo_d, system)
        return bd, e_rep + e_ref

    bds, extra = jax.vmap(one)(batch.topo, batch.changed_atoms,
                               batch.changed_mask)

    # reciprocal space: base grid + batched delta scatters + one batched FFT
    Q0 = pme.charge_grid(x, base_charge, box, K, system.spline_order)

    def dq_one(topo_d, changed, cmask):
        dq = topo_d.charge[jnp.maximum(changed, 0)] \
            - base_charge[jnp.maximum(changed, 0)]
        return pme.delta_charge_grid(x, dq, changed, cmask, box, K,
                                     system.spline_order)

    dQ = jax.vmap(dq_one)(batch.topo, batch.changed_atoms,
                          batch.changed_mask)              # (S, K, K, K)
    e_recip = pme.recip_energy_batched(Q0[None] + dQ, cbw)  # (S,)

    diag = bds.total + extra + e_recip
    return diag, bds, e_recip


def coupling_elements(x, box, batch: DiabatBatch, system: System):
    """H_{parent(d), d} for every non-principle state d."""
    dset = batch.dset
    S = system.evb_max_states
    sidx = jnp.arange(S)
    active = (sidx < dset.n_states) & (sidx > 0)

    def one(topo_d, hop_log_s, n_hops_s, act):
        last = jnp.maximum(n_hops_s - 1, 0)
        donor = hop_log_s[last, 0]
        acceptor = hop_log_s[last, 3]
        return coupling.coupling_element(x, box, topo_d, system,
                                         donor, acceptor, act)

    return jax.vmap(one)(batch.topo, dset.hop_log, dset.n_hops, active)


def assemble_hamiltonian(x, box, batch: DiabatBatch, system: System,
                         pairs, cbw, base_charge):
    S = system.evb_max_states
    dset = batch.dset
    sidx = jnp.arange(S)
    active = sidx < dset.n_states

    diag, bds, e_recip = diabat_diagonal_energies(
        x, box, batch, system, pairs, cbw, base_charge)
    offdiag = coupling_elements(x, box, batch, system)

    # park inactive states far above, with distinct values (degenerate
    # eigenvalues would break nothing here -- c comes from the active block
    # -- but keep eigh well-conditioned)
    diag = jnp.where(active, diag, INACTIVE_DIAG * (1.0 + sidx / S))
    H = jnp.zeros((S, S), x.dtype)
    H = H.at[sidx, sidx].set(diag)
    par = jnp.where(dset.parent >= 0, dset.parent, 0)
    val = jnp.where((dset.parent >= 0) & active, offdiag, 0.0)
    H = H.at[par, sidx].add(val)
    H = H.at[sidx, par].add(val)
    return H, bds, e_recip


@struct.dataclass
class EvbResult:
    energy: jnp.ndarray            # adiabatic ground-state energy
    force: jnp.ndarray             # (N, 3)
    eigenvector: jnp.ndarray       # (S,) ground-state coefficients
    n_states: jnp.ndarray
    principle: jnp.ndarray         # () int32 diabat with max |c_i|
    new_hydronium: jnp.ndarray     # () int32
    hamiltonian: jnp.ndarray       # (S, S)
    breakdown: total_mod.EnergyBreakdown   # principle-diabat decomposition
    overflow: jnp.ndarray


def adiabatic_energy_force(x, box, topo: Topology, system: System,
                           pairs, cbw) -> tuple:
    """Full MS-EVB force/energy evaluation; returns (EvbResult, DiabatBatch)."""
    dset = enumerate_diabats(x, box, topo, system)
    batch = build_diabat_topologies(topo, dset, system)
    base_charge = topo.charge

    def etot(xx):
        H, bds, _ = assemble_hamiltonian(xx, box, batch, system, pairs, cbw,
                                         base_charge)
        w, v = jnp.linalg.eigh(jax.lax.stop_gradient(H))
        ground = jnp.argmin(w)
        c = jax.lax.stop_gradient(v[:, ground])
        e = c @ H @ c
        return e, (H, c, bds)

    (energy, (H, c, bds)), grad = jax.value_and_grad(etot, has_aux=True)(x)

    principle = jnp.argmax(jnp.abs(c))
    new_h = dset.hydronium_of[principle]
    bd0 = jax.tree_util.tree_map(lambda a: a[0], bds)
    result = EvbResult(
        energy=energy, force=-grad, eigenvector=c, n_states=dset.n_states,
        principle=principle.astype(jnp.int32), new_hydronium=new_h,
        hamiltonian=H, breakdown=bd0, overflow=dset.overflow)
    return result, batch
