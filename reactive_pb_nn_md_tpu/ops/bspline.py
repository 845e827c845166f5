"""Cardinal B-splines for PME charge interpolation.

The reference tabulates B-splines on a 1e5-point grid
(initialize_routines.f90:211-226, pme.f90:505-532).  On TPU we evaluate the
Cox-de Boor recursion analytically with a static unroll -- cheaper than a
gather and exactly differentiable, so reciprocal-space forces come out of
autodiff instead of the hand-coded derivative_grid_Q (pme.f90:346-498).
"""

import jax.numpy as jnp


def _mn_all(frac, order):
    """Evaluate M_order(frac + k) for k = 0..order-1 in one shot.

    frac: (...,) in (0, 1).  Returns (..., order).
    Uses the stable iteration: w_k^{(2)} over points x_k = frac + k, then
      M_j(x) = (x M_{j-1}(x) + (j - x) M_{j-1}(x - 1)) / (j - 1)
    where M_{j-1}(x_k - 1) = value of M_{j-1} at point x_{k-1} shifted: since
    x_k - 1 = x_{k-1}, we can reuse the neighbor entry.
    """
    k = jnp.arange(order, dtype=frac.dtype)
    x = frac[..., None] + k                            # (..., order)
    m = jnp.maximum(0.0, 1.0 - jnp.abs(x - 1.0))       # M_2 at x_k
    for j in range(3, order + 1):
        # M_{j-1}(x_k - 1) == M_{j-1}(x_{k-1}) -> shift along k axis
        m_shift = jnp.concatenate(
            [jnp.zeros_like(m[..., :1]), m[..., :-1]], axis=-1)
        m = (x * m + (j - x) * m_shift) / (j - 1)
    return m


def bspline_weights(u, order):
    """PME spreading weights and grid offsets for scaled coordinate u.

    u: (...,) in [0, K).  Returns (weights, grid_index_offsets) where
    weights[..., k] = M_order(frac + k) and the grid point for slot k is
    (floor(u) - k) mod K  -- identical to grid_Q (pme.f90:218-260).
    """
    nearpt = jnp.floor(u)
    frac = u - nearpt
    w = _mn_all(frac, order)
    return w, nearpt.astype(jnp.int32)


def bm_sq_factors(K, order):
    """|b(m)|^2 Essmann factors (pme.f90:578-595), numpy/host-side."""
    import numpy as np

    def mn(x, n):
        if n == 2:
            return max(0.0, 1.0 - abs(x - 1.0))
        return (x * mn(x, n - 1) + (n - x) * mn(x - 1, n - 1)) / (n - 1)

    mvals = np.array([mn(i + 1.0, order) for i in range(order - 1)])
    m = np.arange(K)
    phase = 2.0 * np.pi * np.outer(m, np.arange(order - 1)) / K
    b = (mvals[None, :] * np.exp(1j * phase)).sum(axis=1)
    bm = 1.0 / b
    return (bm.real ** 2 + bm.imag ** 2)
