"""Velocity initialization and kinetic energy.

Maxwell-Boltzmann sampling with COM-momentum removal and exact rescale to
the target temperature (sample_atomic_velocities, md_integration.f90:48-118);
frozen atom types get zero velocity and are excluded from the counts."""

import jax
import jax.numpy as jnp

from ..utils.constants import CONV_KJMOL_A2PS2GMOL, KB


def freeze_mask(system, topo):
    """(N,) bool: True for mobile atoms."""
    return system.ff.freeze_by_type[topo.atom_type] != 1


def kinetic_energy(v, mass):
    return 0.5 * jnp.sum(mass[:, None] * v * v) / CONV_KJMOL_A2PS2GMOL


def remove_com_momentum(v, mass, mobile):
    """Subtract the net per-atom momentum so total momentum is zero
    (subtract_center_of_mass_momentum, md_integration.f90:125-177)."""
    n = jnp.sum(mobile)
    p = jnp.sum(jnp.where(mobile[:, None], mass[:, None] * v, 0.0), axis=0)
    dv = p / n / mass[:, None]
    return jnp.where(mobile[:, None], v - dv, v)


def sample_velocities(key, mass, temperature, mobile):
    """Draw MB velocities, remove COM momentum, rescale to exact T."""
    sigma = jnp.sqrt(KB * temperature * CONV_KJMOL_A2PS2GMOL
                     / mass)[:, None]
    v = sigma * jax.random.normal(key, (mass.shape[0], 3), dtype=mass.dtype)
    v = jnp.where(mobile[:, None], v, 0.0)
    v = remove_com_momentum(v, mass, mobile)
    ke = 0.5 * jnp.sum(jnp.where(mobile[:, None], mass[:, None] * v * v, 0.0)
                       ) / CONV_KJMOL_A2PS2GMOL
    n = jnp.sum(mobile)
    target = 1.5 * KB * temperature * n
    return v * jnp.sqrt(target / ke)
