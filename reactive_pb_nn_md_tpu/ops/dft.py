"""3-D real-to-half-spectrum DFT as MXU matmuls.

XLA:TPU lowers jnp.fft to a generic convolution/custom-call path that
measured ~0.5 ms per 64^3 transform inside the MD step ("convolution
fusion" in hlo_stats).  For the PME grids used here (cubic, K <= 128)
the same transform is three (K, K)-by-(K, K^2) matmul contractions --
microseconds of MXU time -- and autodiff gives the adjoint transform as
matmuls for free, so the force backward pass wins twice.

Matches jnp.fft.rfftn(Q) exactly in convention (e^{-2 pi i m k / K},
half spectrum on the last axis); equality is pinned by
tests/test_electrostatics.py::test_rfft3_matmul_matches_fft.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _twiddles(K, dtype_name):
    """(cos, sin) tables for the full (K, K) and half (K, Kh) axes,
    angle = -2 pi k m / K (the numpy forward-FFT sign convention)."""
    k = np.arange(K)
    Kh = K // 2 + 1
    ang_f = -2.0 * np.pi * np.outer(k, k) / K          # (K, K)
    ang_h = ang_f[:, :Kh]                              # (K, Kh)
    dt = np.dtype(dtype_name)
    return (np.cos(ang_f).astype(dt), np.sin(ang_f).astype(dt),
            np.cos(ang_h).astype(dt), np.sin(ang_h).astype(dt))


def rfft3_matmul(Q):
    """rfftn of a real cubic (K, K, K) grid via three MXU contractions.

    Returns the (K, K, K//2+1) complex half spectrum, bit-compatible in
    layout with jnp.fft.rfftn (values agree to fp roundoff)."""
    K = Q.shape[-1]
    assert Q.shape[-3:] == (K, K, K), Q.shape
    cF, sF, cH, sH = (jnp.asarray(t) for t in
                      _twiddles(K, jnp.dtype(Q.dtype).name))
    hi = jax.lax.Precision.HIGHEST
    # last axis: real input -> half spectrum
    Fr = jnp.einsum("abk,km->abm", Q, cH, precision=hi)
    Fi = jnp.einsum("abk,km->abm", Q, sH, precision=hi)
    # middle axis: full complex DFT, (Fr + i Fi)(c + i s)
    Gr = (jnp.einsum("abm,bn->anm", Fr, cF, precision=hi)
          - jnp.einsum("abm,bn->anm", Fi, sF, precision=hi))
    Gi = (jnp.einsum("abm,bn->anm", Fr, sF, precision=hi)
          + jnp.einsum("abm,bn->anm", Fi, cF, precision=hi))
    # first axis
    Hr = (jnp.einsum("anm,al->lnm", Gr, cF, precision=hi)
          - jnp.einsum("anm,al->lnm", Gi, sF, precision=hi))
    Hi = (jnp.einsum("anm,al->lnm", Gr, sF, precision=hi)
          + jnp.einsum("anm,al->lnm", Gi, cF, precision=hi))
    return jax.lax.complex(Hr, Hi)


def rfft3_fast(Q):
    """Half-spectrum 3-D DFT with the TPU-fast implementation: MXU
    matmul DFT on TPU fp32 cubic grids up to K=128, jnp.fft.rfftn
    otherwise (CPU fp64 ground truth keeps the library FFT)."""
    K = Q.shape[-1]
    if (jax.default_backend() == "tpu" and Q.dtype == jnp.float32
            and Q.ndim == 3 and Q.shape == (K, K, K) and K <= 128):
        return rfft3_matmul(Q)
    return jnp.fft.rfftn(Q, axes=(-3, -2, -1))
