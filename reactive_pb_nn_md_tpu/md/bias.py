"""Umbrella-sampling bias potentials on the proton-transfer coordinate.

The reference engine computes the transfer geometry (q, R_OO) inside its
diabatic-coupling element (ms_evb.f90:1117-1266) but has no machinery to
BIAS along it -- umbrella-sampling free energies are the stated purpose of
the replica ensemble axis (BASELINE config 5).  This module supplies that
machinery TPU-natively: a harmonic restraint on a scalar collective
variable (CV), fully differentiable, added inside the jitted MD step so a
window ladder is just a vmap over bias parameters (parallel/umbrella.py).

Collective variables (atoms = [donor heavy, acceptor heavy, proton],
GLOBAL atom indices -- stable across proton-hop topology switches because
positions are shared across diabats):

  cv_type 0  delta r_OH = |r_H - r_Od| - |r_H - r_Oa|   (A)
             the proton asymmetric stretch: < 0 proton on the donor,
             0 shared (Zundel), > 0 proton transferred.
  cv_type 1  R_OO = |r_Od - r_Oa|                        (A)
             the donor-acceptor compression coordinate.

Distances are minimum-imaged, so the CV is well-defined in PBC as long as
the participating atoms stay within half a box length of each other (they
do by construction -- a restrained transfer pair sits at ~2.2-3 A).
"""

import jax
import jax.numpy as jnp
from flax import struct

from ..utils import pbc


@struct.dataclass
class HarmonicBias:
    """U = 0.5 k (cv - center)^2.  All fields are traced arrays so a
    window LADDER is one vmap with per-window (k, center) and shared or
    per-window atoms."""
    atoms: jnp.ndarray      # (3,) int32: [donor heavy, acceptor heavy, H]
    k: jnp.ndarray          # () kJ/mol/A^2
    center: jnp.ndarray     # () A
    cv_type: int = struct.field(pytree_node=False, default=0)


def _dist(a, b, box):
    dr = pbc.min_image(a - b, box)
    return jnp.sqrt(jnp.maximum(jnp.sum(dr * dr), 1e-12))


def collective_variable(x, box, bias: HarmonicBias):
    """Scalar CV value for the bias' atom triple."""
    # one-hot row gather keeps the backward pass scatter-free on TPU
    # (same rationale as models/coupling.py's geometric factor)
    from ..ops.lookup import rows_onehot
    r = rows_onehot(x, bias.atoms)
    r_d, r_a, r_h = r[0], r[1], r[2]
    if bias.cv_type == 0:
        return _dist(r_h, r_d, box) - _dist(r_h, r_a, box)
    if bias.cv_type == 1:
        return _dist(r_d, r_a, box)
    raise ValueError(f"unknown cv_type {bias.cv_type}")


def bias_energy(x, box, bias):
    """Total restraint energy.  `bias` is one HarmonicBias or a tuple of
    them (e.g. the production proton-transfer ladder pairs the delta-r_OH
    window restraint with a soft R_OO keeper that holds the donor/acceptor
    pair together -- standard umbrella practice for transfer coordinates)."""
    if isinstance(bias, (tuple, list)):
        return sum(bias_energy(x, box, b) for b in bias)
    cv = collective_variable(x, box, bias)
    return 0.5 * bias.k * (cv - bias.center) ** 2


def bias_energy_force(x, box, bias):
    """(energy, force) of the restraint(s); force = -dU/dx via autodiff
    (each CV involves three atoms, so the backward pass is O(1))."""
    e, g = jax.value_and_grad(bias_energy)(x, box, bias)
    return e, -g


def primary_cv(x, box, bias):
    """The sampled CV for diagnostics: the FIRST restraint's CV when a
    tuple is given (the window coordinate; keepers come after)."""
    if isinstance(bias, (tuple, list)):
        bias = bias[0]
    return collective_variable(x, box, bias)
