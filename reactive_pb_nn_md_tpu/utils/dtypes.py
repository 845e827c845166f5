"""Precision policy.

The reference engine is fp64 throughout.  On TPU, fp64 is emulated and slow;
fp32 is native.  We therefore make the float dtype a runtime policy:

  fp64  - full double (CPU tests, parity checks); requires jax x64 mode
  fp32  - native TPU single precision (production MD)

Kernels read the dtype from their inputs, so the policy only matters when
constructing the System/State pytrees.
"""

import jax
import jax.numpy as jnp

_POLICY = {"float": jnp.float32}


def set_precision(precision: str):
    # TPU matmuls default to bf16 passes; the engine's coordinate
    # transforms (x @ recip_box in every minimum image / PME scaling) and
    # the one-hot table lookups must run at full fp32 -- bf16 there costs
    # ~1e-2 Angstrom coordinate error and ~0.4% force-field parameters
    # (measured: 5% PME force error on the v5e before this was set).
    jax.config.update("jax_default_matmul_precision", "float32")
    if precision == "fp64":
        jax.config.update("jax_enable_x64", True)
        _POLICY["float"] = jnp.float64
    elif precision in ("fp32", "mixed"):
        _POLICY["float"] = jnp.float32
    else:
        raise ValueError(f"unknown precision {precision!r}")


def default_float():
    return _POLICY["float"]
