"""Umbrella-sampling window ladders over the vmapped replica axis.

BASELINE config 5's purpose: proton-transfer free energies from 16-64
harmonically-restrained replicas.  The reference engine would run one
process per window (its only parallelism is OpenMP within a process,
SURVEY §2.3); here the whole ladder is ONE jitted program -- md_scan
vmapped over (replica state, bias parameters) -- so a 16-window ladder
advances 16 x chunk steps per device dispatch and the TPU sees a batch
axis it can tile.

The workflow (driven by scripts/umbrella_pmf.py, estimator
analysis/wham.py):

    atoms   = transfer_triple(ms)             # donor O, acceptor O, H
    ladder  = make_ladder(atoms, centers, k)  # (W,)-batched HarmonicBias
    batch   = ensemble.stack_replicas(ms, W, key)
    cv, ... = sample_ladder(...)              # (W, T) CV series
    pmf     = wham.wham(cv, centers, k, T)
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..md import integrators
from ..md.bias import HarmonicBias
from . import ensemble


def transfer_triple(ms, system, acceptor_rank=0):
    """Pick the proton-transfer atom triple from the current state, host
    side: (donor heavy = hydronium's heaviest atom, acceptor heavy =
    `acceptor_rank`-th nearest heavy atom of another molecule, H = the
    donor proton most aligned with the donor->acceptor axis).  This is the
    same geometry the coupling element anchors on (models/coupling.py,
    reference ms_evb.f90:1117-1266), resolved once for the restraint.
    Returns (3,) int32 [O_donor, O_acceptor, H] global atom indices."""
    x = np.asarray(ms.state.x, np.float64)
    L = np.diag(np.asarray(ms.state.box, np.float64))
    topo = ms.topo
    mass = np.asarray(system.mass, np.float64)
    hyd = int(np.asarray(topo.hydronium_mol))
    mol_of = np.asarray(topo.atom_mol)
    atoms_h = np.asarray(topo.mol_atoms[hyd])
    atoms_h = atoms_h[atoms_h >= 0]
    O_d = int(atoms_h[np.argmax(mass[atoms_h])])
    cand = np.where((mass > 10.0) & (mol_of != hyd))[0]
    dr = x[cand] - x[O_d]
    dr -= np.round(dr / L) * L
    dist = np.linalg.norm(dr, axis=1)
    k = int(np.argsort(dist)[acceptor_rank])
    u = dr[k] / dist[k]
    O_a = int(cand[k])
    hs = atoms_h[mass[atoms_h] < 2.0]
    dh = x[hs] - x[O_d]
    dh -= np.round(dh / L) * L
    H = int(hs[np.argmax(dh @ u)])
    return np.array([O_d, O_a, H], np.int32)


def seeded_window_states(ms, system, cbw, atoms, centers, r_oo=2.5,
                         temperature=300.0, base_key=None, ladder=None):
    """Per-window initial states with the transfer geometry CONSTRUCTED at
    each window's center: the acceptor molecule is rigid-shifted to
    R_OO = r_oo and the restrained proton is placed on the O-O axis so
    delta r_OH = center_w (collinear: r_dH = (R_OO + c)/2).  Starting each
    window ON its center avoids the violent drag-in a far-from-center
    restraint would exert (the same bridge-construction protocol as the
    seeded reactive bench, bench.run_bench_reactive).

    Returns a (W,)-stacked MDState batch (one tree_map-stack of per-window
    initial_md_state results -- each window's init force evaluation may
    already switch topology when seeded past the diabatic crossing, which
    is correct and intended)."""
    import jax.random as jrandom
    from ..md import velocities as vel_mod

    x0 = np.asarray(ms.state.x, np.float64)
    L = np.diag(np.asarray(ms.state.box, np.float64))
    mol_of = np.asarray(ms.topo.atom_mol)
    O_d, O_a, H = int(atoms[0]), int(atoms[1]), int(atoms[2])
    acc_atoms = np.where(mol_of == mol_of[O_a])[0]
    if base_key is None:
        base_key = jrandom.PRNGKey(17)
    keys = jrandom.split(base_key, len(centers))
    mobile = vel_mod.freeze_mask(system, ms.topo)

    states = []
    fdt = ms.state.x.dtype
    for w, c in enumerate(np.asarray(centers, np.float64)):
        x = x0.copy()
        dr = x[O_a] - x[O_d]
        dr -= np.round(dr / L) * L
        d = np.linalg.norm(dr)
        u = dr / d
        x[acc_atoms] += (r_oo - d) * u
        x[H] = x[O_d] + 0.5 * (r_oo + c) * u
        kw, vk = jrandom.split(keys[w])
        v = vel_mod.sample_velocities(vk, system.mass, temperature, mobile)
        st = ms.state.replace(x=jnp.asarray(x, fdt), v=v, key=kw)
        bias_w = (None if ladder is None else
                  jax.tree_util.tree_map(lambda a: a[w], ladder))
        states.append(integrators.initial_md_state(
            st, ms.topo, system, cbw, ms.nlist.capacity,
            cells=ms.nlist.cells or None,
            react_cap=ms.nlist.react_cap or None, bias=bias_w))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def make_ladder(atoms, centers, k_spring, cv_type=0, dtype=jnp.float32):
    """(W,)-batched HarmonicBias: shared atom triple, per-window center.
    k_spring scalar or (W,)."""
    centers = jnp.asarray(centers, dtype)
    W = centers.shape[0]
    k = jnp.broadcast_to(jnp.asarray(k_spring, dtype), (W,))
    at = jnp.broadcast_to(jnp.asarray(atoms, jnp.int32)[None, :], (W, 3))
    return HarmonicBias(atoms=at, k=k, center=centers, cv_type=cv_type)


def make_ladder_scan(system, cbw, dt, ensemble_name, n_steps, friction=1.0,
                     temperature=300.0):
    """Jitted scan of the vmapped biased MD step: W windows advance
    n_steps in ONE dispatch.  Two-tier state evaluation is disabled under
    vmap (see ensemble._no_tier)."""
    system = ensemble._no_tier(system)

    def one(ms, bias):
        return integrators.md_scan.__wrapped__(
            ms, system, cbw, dt, ensemble_name, n_steps, friction,
            temperature, bias)

    return jax.jit(jax.vmap(one))


def sample_ladder(scan, batch, ladder, n_equil, n_sample, chunk,
                  on_chunk=None):
    """Drive a ladder scan: n_equil discarded steps, then n_sample steps
    whose CV samples are collected.  Returns (batch, cv (W, >=n_sample)
    float64, info dict with hop counts and overflow flags)."""
    cvs = []
    hops = 0
    n_eq_done = 0
    while n_eq_done < n_equil:
        batch, diag = scan(batch, ladder)
        n_eq_done += chunk
        hops += int(np.asarray(diag.hopped).sum())
    done = 0
    overflow = False
    while done < n_sample:
        batch, diag = scan(batch, ladder)
        done += chunk
        cvs.append(np.asarray(diag.cv, np.float64))   # (W, chunk)
        hops += int(np.asarray(diag.hopped).sum())
        overflow = overflow or bool(np.asarray(diag.evb_overflow).any()) \
            or bool(np.asarray(diag.nbr_overflow).any())
        if on_chunk is not None:
            on_chunk(batch, diag)
    cv = np.concatenate(cvs, axis=1)
    return batch, cv, {"hops": hops, "overflow": overflow,
                       "steps_sampled": done, "steps_equil": n_eq_done}
