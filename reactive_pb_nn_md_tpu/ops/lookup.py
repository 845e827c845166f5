"""Table lookups as one-hot matmuls.

XLA:TPU lowers per-element gathers from tiny parameter tables to a
serialized scatter/gather path (~200 ns/element measured -- the single
hottest op in the MD step profile).  For a (T,T,C) force-field table with
T <= ~25, the same lookup is exact as a one-hot (P, T*T) @ (T*T, C) matmul
on the MXU: products are 0/1 * value, so the result is bit-identical to
the gather.
"""

import jax.numpy as jnp


def one_hot_f(t, T, dtype):
    """Exact 0/1 one-hot of an int array, shape t.shape + (T,)."""
    return (t[..., None] == jnp.arange(T, dtype=jnp.int32)).astype(dtype)


def rows_onehot(x, idx):
    """x[idx] for a SMALL int row-index array, as a one-hot matmul.

    The forward gather itself is fine on TPU, but its autodiff TRANSPOSE
    is a scatter-add whose row indices repeat across the diabat vmap, and
    XLA:TPU lowers that to a sequential while loop of ONE row per
    iteration (measured: three such loops = 128 serialized iterations per
    MD step from the EVB coupling/repulsion force backward).  As a
    one-hot matmul the transpose is itself a matmul.  Bit-exact under
    HIGHEST precision: products are 0/1 * value.  Only worth it when
    idx is small (the one-hot is (B, N))."""
    import jax
    oh = one_hot_f(idx.reshape(-1), x.shape[0], x.dtype)
    res = jnp.matmul(oh, x, precision=jax.lax.Precision.HIGHEST)
    return res.reshape(idx.shape + x.shape[1:])


def pair_lookup(table, ti, tj):
    """table[(ti, tj)] for broadcastable int index arrays ti, tj.

    table: (T, T) or (T, T, C).  Returns the broadcast shape (or + (C,))
    with the table's dtype (integer tables go through f32, exact for
    |v| < 2^24)."""
    T = table.shape[0]
    squeeze = table.ndim == 2
    flat = table.reshape(T * T, -1)                    # (T^2, C)
    idx = (ti.astype(jnp.int32) * T + tj.astype(jnp.int32))
    shape = idx.shape
    idx = idx.reshape(-1)

    out_dtype = table.dtype
    f = flat.astype(jnp.float32) if flat.dtype != jnp.float64 else flat
    oh = one_hot_f(idx, T * T, f.dtype)
    res = oh @ f                                       # (P, C) on the MXU
    if jnp.issubdtype(out_dtype, jnp.integer):
        res = jnp.round(res).astype(out_dtype)
    else:
        res = res.astype(out_dtype)
    res = res.reshape(shape + (flat.shape[1],))
    return res[..., 0] if squeeze else res
