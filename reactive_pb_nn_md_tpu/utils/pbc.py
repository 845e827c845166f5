"""Periodic-boundary-condition helpers.

The reference engine supports general triclinic boxes in its PBC helpers
(general_routines.f90:535-568) but the driver asserts orthorhombic boxes
(main_ms_evb.f90:62-68).  We implement the general form; all shift vectors
are integer lattice translations and are excluded from gradients so that
autodiff forces match the analytic reference forces.

Row convention: ``box[i]`` is the i-th lattice vector (matches the
reference's ``box(i,:)``).
"""

import jax
import jax.numpy as jnp


def box_volume(box):
    cross = jnp.cross(box[1], box[2])
    return jnp.abs(jnp.dot(box[0], cross))


def inv3x3(m):
    """Analytic 3x3 inverse (adjugate / det).  Avoids LU decomposition,
    which XLA:TPU lacks for f64 and which is overkill for a box matrix."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.array([
        [A, -(b * i - c * h), b * f - c * e],
        [B, a * i - c * g, -(a * f - c * d)],
        [C, -(a * h - b * g), a * e - b * d],
    ], dtype=m.dtype)
    return adj / det


def recip_vectors(box):
    """Reciprocal lattice vectors (rows), no 2*pi factor.

    Equivalent to construct_reciprocal_lattice_vector
    (general_routines.f90:473-490): kk = inv(box)^T, i.e. kk[i] . box[j] = delta_ij.
    """
    return inv3x3(box).T


def xyz_to_frac(x, box):
    """Cartesian -> fractional coordinates. x: (..., 3)."""
    return x @ recip_vectors(box).T


def min_image_shift(dr, box):
    """Integer lattice shift (as a cartesian translation) bringing dr to
    its minimum image.  Gradient-free by construction (floor).

    Matches pbc_shift (general_routines.f90:535-558): returns the lattice
    translation S such that dr - S is the minimum image.
    """
    frac = xyz_to_frac(dr, box)
    n = jnp.floor(frac + 0.5)
    return jax.lax.stop_gradient(n) @ box


def min_image(dr, box):
    """Minimum-image displacement for general boxes."""
    return dr - min_image_shift(dr, box)


def min_image_ortho(dr, box_diag):
    """Minimum image for orthorhombic boxes (hot-path form used by the
    reference's real-space kernel, pair_int_real_space.f90:221-224)."""
    shift = jnp.floor(dr / box_diag + 0.5)
    return dr - jax.lax.stop_gradient(shift) * box_diag


def wrap_into_box(x, box):
    """Wrap positions into the primary cell [0, box)."""
    frac = xyz_to_frac(x, box)
    shift = jnp.floor(frac)
    return x - jax.lax.stop_gradient(shift) @ box


def scaled_grid_coords(x, box, K, eps=1e-6):
    """Fractional coordinates scaled by PME grid size K, folded to [0, K).

    Mirrors create_scaled_direct_coordinates (general_routines.f90:497-524)
    including the small epsilon nudge away from exact integers, which keeps
    the B-spline interval assignment well defined.
    """
    u = xyz_to_frac(x, box) * K
    u = jnp.where(u < 0.0, u + K, u)
    u = jnp.where(u >= K, u - K, u)
    # keep away from exact integers (reference uses 1e-6)
    u = jnp.where(jnp.abs(u - jnp.round(u)) < eps, u + eps, u)
    return u
