"""PB-NN diabatic coupling: neural off-diagonal elements (function type 3).

The reference's diabatic-coupling dispatch (ms_evb.f90:1196-1263) has two
analytic forms; the "PB-NN" name of the upstream project points at a
neural third form.  Here it is: a small MLP over symmetry-invariant
features of the proton-transfer geometry,

    A_nn = MLP([q^2, R_OO, exp(-R_OO) [, cn_donor, cn_acceptor]])

used as the geometric factor, with a learnable Vconst.  The optional
ENVIRONMENT features (round 4) are the smooth first-solvation-shell
coordination numbers of the donor and acceptor heavy atoms, computed
differentiably in models/coupling._env_features -- the "presolvation"
descriptor that makes the coupling environment-dependent (the physical
content of the PB-NN idea: an acceptor that already holds 4 hydrogen
bonds couples more weakly than an undercoordinated one).  An MLP whose
first layer has 3 input rows is geometry-only; 5 rows switches the
environment features on -- no separate flag, the parameter shape IS the
configuration.

The element stays H_ij = (Vconst + Vex) * A_nn, so the exchange-charge
electrostatics and Hellmann-Feynman force path are unchanged, and the
parameters are a pytree that can be optimized end-to-end with optax
against ab initio data (the whole adiabatic energy is differentiable
w.r.t. nn_params).
"""

import jax
import jax.numpy as jnp

# upper bound of the sigmoid output head (see apply_mlp): the analytic
# surfaces peak at ~1.25 over the admissible (q2, R_OO) range
A_MAX = 2.5


def init_mlp(key, hidden=(16, 16), vconst=-100.0, dtype=jnp.float32,
             n_env=0):
    """n_env > 0 adds that many environment-feature inputs (2 = the
    donor/acceptor coordination numbers of models/coupling._env_features)."""
    sizes = (3 + n_env,) + tuple(hidden) + (1,)
    params = {"vconst": jnp.asarray(vconst, dtype), "w": [], "b": []}
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / sizes[i]).astype(dtype)
        params["w"].append(
            jax.random.normal(sub, (sizes[i], sizes[i + 1]), dtype) * scale)
        params["b"].append(jnp.zeros((sizes[i + 1],), dtype))
    return params


def apply_mlp(params, q2, roo, env=None):
    """env: optional (n_env,) environment features; when the MLP expects
    them but none are given (e.g. pretraining on the geometric surface
    alone) they default to zero -- the centred/normalized encoding of
    _env_features makes zero the 'mean-field solvation' point."""
    n_in = params["w"][0].shape[0]
    h = jnp.stack([q2, roo, jnp.exp(-roo)])
    if n_in > 3:
        if env is None:
            env = jnp.zeros((n_in - 3,), h.dtype)
        h = jnp.concatenate([h, env.astype(h.dtype)])
    h = h.reshape(1, n_in)
    for w, b in zip(params["w"][:-1], params["b"][:-1]):
        h = jnp.tanh(h @ w + b)
    out = h @ params["w"][-1] + params["b"][-1]
    # bounded head: A_nn in (0, A_MAX).  Both analytic geometric factors
    # live in [0, ~1.3] over the candidate-admissible geometry range; a
    # raw linear head extrapolates unboundedly on the strained mid-hop
    # geometries a REACTIVE trajectory visits (round-5: a pretrained-only
    # MLP drove |F| past the 1e4 abort in a production run), while the
    # sigmoid bound also caps the force contribution (|dA/draw| <=
    # A_MAX/4).  Positivity matches the physics: A is an overlap-decay
    # envelope, and the coupling's sign lives in Vconst (eq. 10/11 of the
    # MS-EVB3 paper; ms_evb.f90:1196-1263).
    return (A_MAX * jax.nn.sigmoid(out)).reshape(())
