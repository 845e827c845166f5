"""Real-space nonbonded pair kernels.

Physics identical to pair_int_real_space.f90, evaluated analytically
(no lookup tables -- erfc/exp are cheap on the TPU VPU, cf. the reference's
1e5-point erfc/ewaldscale tables, initialize_routines.f90:228-242):

  ewald_real   : qq erfc(a r)/r                 (pairwise_real_space_ewald:698)
  lj           : C12/r^12 - C6/r^6              (pairwise_real_space_LJ:621)
  sapt         : A e^{-Br} - sum_n f_n(Br) Cn/r^n, n = 6,8,10,12 with
                 Tang-Toennies damping          (pairwise_real_space_sapt:651)
  ewald_excl   : -(qq erf(a r)/r) intra-exclusion correction
                 (intra_pme_exclusion:781)

All functions return per-pair energies; forces come from jax.grad of the
summed energy (verified against the reference's analytic forms by
finite-difference tests).
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

from ..utils.constants import CONV_E2A_KJMOL, SQRT_PI


def tang_toennies(x, n):
    """f_n(x) = 1 - e^{-x} sum_{k=0}^{n} x^k / k!
    (general_routines.f90:1782-1801).

    Clamped to 1 beyond x = 40 (error < 3e-7 for n <= 12; the reference
    clamps at its table edge x = 50, glob_v.f90:347).  The clamp also keeps
    the partial sums inside fp32 range when the dispatch evaluates this
    branch with non-SAPT parameters."""
    xc = jnp.minimum(x, 40.0)
    term = jnp.ones_like(xc)
    s = jnp.ones_like(xc)
    for k in range(1, n + 1):
        term = term * xc / k
        s = s + term
    return jnp.where(x < 40.0, 1.0 - s * jnp.exp(-xc), 1.0)


def ewald_real(qq, r, alpha):
    return qq * erfc(alpha * r) / r * CONV_E2A_KJMOL


def ewald_exclusion_correction(qq, r, alpha):
    """Remove reciprocal-space contribution of excluded intra pairs:
    -qq erf(a r)/r, with the r->0 limit -2 a/sqrt(pi) qq
    (intra_pme_exclusion, pair_int_real_space.f90:781-816)."""
    small = 1e-8
    safe_r = jnp.where(r < small, 1.0, r)
    e = qq * (erfc(alpha * safe_r) - 1.0) / safe_r
    e0 = -2.0 * alpha / SQRT_PI * qq
    return jnp.where(r < small, e0, e) * CONV_E2A_KJMOL


def lj(c12, c6, r2):
    inv_r6 = 1.0 / (r2 * r2 * r2)
    return c12 * inv_r6 * inv_r6 - c6 * inv_r6


def sapt(params, r, r2):
    """SAPT-FF modified Buckingham.  params[..., 0:6] = A, B, C6, C8, C10, C12."""
    A, B = params[..., 0], params[..., 1]
    x = B * r
    inv_r2 = 1.0 / r2
    inv_r6 = inv_r2 * inv_r2 * inv_r2
    inv_r8 = inv_r6 * inv_r2
    inv_r10 = inv_r8 * inv_r2
    inv_r12 = inv_r10 * inv_r2
    e = A * jnp.exp(-x)
    e = e - tang_toennies(x, 6) * params[..., 2] * inv_r6
    e = e - tang_toennies(x, 8) * params[..., 3] * inv_r8
    e = e - tang_toennies(x, 10) * params[..., 4] * inv_r10
    e = e - tang_toennies(x, 12) * params[..., 5] * inv_r12
    return e


def vdw_pair_energy(vtype, params, params_14, is_14, r, r2, has_sapt=True):
    """Dispatch over vdw type codes (0 LJ / 1 SAPT / -1 none) for a batch of
    pairs.  1-4 pairs take the special C12/C6 table (GROMOS convention,
    pair_int_real_space.f90:477-481).  has_sapt=False (static) removes the
    Buckingham branch from the compiled program entirely."""
    p_lj = jnp.where(is_14[..., None], params_14, params)
    e_lj = lj(p_lj[..., 0], p_lj[..., 1], r2)
    e = jnp.where(vtype == 0, e_lj, 0.0)
    if has_sapt:
        e = jnp.where(vtype == 1, sapt(params, r, r2), e)
    return e
