"""PB-NN diabatic coupling: neural off-diagonal elements (function type 3).

The reference's diabatic-coupling dispatch (ms_evb.f90:1196-1263) has two
analytic forms; the "PB-NN" name of the upstream project points at a
neural third form.  Here it is: a small MLP over symmetry-invariant
features of the proton-transfer geometry,

    A_nn(q^2, R_OO) = MLP([q^2, R_OO, exp(-R_OO)])

used as the geometric factor, with a learnable Vconst.  The element stays
H_ij = (Vconst + Vex) * A_nn, so the exchange-charge electrostatics and
Hellmann-Feynman force path are unchanged, and the parameters are a pytree
that can be optimized end-to-end with optax against ab initio data (the
whole adiabatic energy is differentiable w.r.t. nn_params).
"""

import jax
import jax.numpy as jnp


def init_mlp(key, hidden=(16, 16), vconst=-100.0, dtype=jnp.float32):
    sizes = (3,) + tuple(hidden) + (1,)
    params = {"vconst": jnp.asarray(vconst, dtype), "w": [], "b": []}
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / sizes[i]).astype(dtype)
        params["w"].append(
            jax.random.normal(sub, (sizes[i], sizes[i + 1]), dtype) * scale)
        params["b"].append(jnp.zeros((sizes[i + 1],), dtype))
    return params


def apply_mlp(params, q2, roo):
    h = jnp.stack([q2, roo, jnp.exp(-roo)]).reshape(1, 3)
    for w, b in zip(params["w"][:-1], params["b"][:-1]):
        h = jnp.tanh(h @ w + b)
    out = h @ params["w"][-1] + params["b"][-1]
    return out.reshape(())
