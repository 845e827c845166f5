"""PB-NN training: fit the neural diabatic coupling (function type 3).

The upstream project's "PB-NN" name promises neural off-diagonal EVB
elements; the reference ships only the two analytic forms (dispatch at
ms_evb.f90:1196-1263).  This module closes the loop for the extension
point `nn/coupling_mlp.py` provides: a two-stage workflow that produces a
trained coupling MLP from data,

  stage 1  pretrain_geometric : regress the MLP on labelled geometric
           factors A(q^2, R_OO) over the physical (q^2, R_OO) range --
           the cheap supervised fit (labels here come from the analytic
           MS-EVB3 surface as a stand-in for ab initio couplings).
  stage 2  finetune_adiabatic : descend on adiabatic ground-state
           energies of whole frames, differentiating through the FULL
           engine (enumeration -> per-diabat energies -> coupling ->
           eigh), i.e. the loss the physics actually cares about.  This
           is only possible because the engine is one pure jitted
           function of the parameters -- the TPU-native design's payoff.

Everything is plain optax + jit; the vmapped per-frame adiabatic energy
reuses the production `evb.hamiltonian.adiabatic_energy_force` unchanged.
"""

import jax
import jax.numpy as jnp
import optax

from .coupling_mlp import init_mlp, apply_mlp
from ..models.coupling import geometric_factor
from ..evb import hamiltonian as _ham


def analytic_geometric_surface(cpl_params_row, q2, roo, cpl_func=1):
    """Label source: the analytic A factor on (q2, roo) batches.

    cpl_params_row: the (>=10,) coupling parameter row for the triple
    being replaced (evb.cpl_params[t1, t2, t3]); cpl_func: that triple's
    function type (1 = MS-EVB3, 2 = product-of-Gaussians -- the two
    analytic dispatch targets, ms_evb.f90:1196-1263).  Pass the row's own
    evb.cpl_func value; a type-2 row pretrained against the type-1 form
    would silently learn the wrong surface."""
    p = jnp.asarray(cpl_params_row)
    func = jnp.asarray(cpl_func)

    def one(q2s, roos):
        # geometric_factor consumes vectors; synthesize axis-aligned ones
        qv = jnp.stack([jnp.sqrt(jnp.maximum(q2s, 0.0)), 0.0 * q2s,
                        0.0 * q2s])
        rv = jnp.stack([roos, 0.0 * roos, 0.0 * roos])
        return geometric_factor(func, p, qv, rv)

    return jax.vmap(one)(q2, roo)


def sample_geometries(key, n, q2_range=(0.0, 0.6), roo_range=(2.2, 3.2),
                      dtype=jnp.float64):
    """Uniform (q2, roo) samples over the Zundel-geometry range the
    candidate cutoffs admit (pair distance <= 2.5 A + skin,
    glob_v.f90:54-55 -> R_OO ~ 2.2-3.2 A; |q| <= ~0.8 A)."""
    kq, kr = jax.random.split(key)
    q2 = jax.random.uniform(kq, (n,), dtype, *q2_range)
    roo = jax.random.uniform(kr, (n,), dtype, *roo_range)
    return q2, roo


def pretrain_geometric(cpl_params_row, key, hidden=(16, 16), n_samples=2048,
                       steps=2000, lr=1e-2, dtype=jnp.float64, cpl_func=1,
                       n_env=0):
    """Stage 1: supervised fit of the MLP to labelled A(q2, roo).

    Returns (nn_params, final_rmse).  vconst is copied from the analytic
    row (it multiplies the whole element, so it is degenerate with the
    MLP's output scale during pretraining; finetuning can move it).
    cpl_func selects the analytic label surface (the triple's own
    evb.cpl_func value).  Measured on the MS-EVB3 surface (labels in
    ~[0.1, 1.1]): rmse 0.013 at 2000 steps, 0.009 at 4000
    (cosine-decayed adam, (16, 16) tanh)."""
    kd, ki = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    q2, roo = sample_geometries(kd, n_samples, dtype=dtype)
    labels = analytic_geometric_surface(cpl_params_row, q2, roo,
                                        cpl_func=cpl_func)

    # n_env > 0 reserves environment-feature inputs (coordination numbers,
    # models/coupling._env_features); pretraining evaluates them at zero
    # (= mean-field solvation), so the surface fit is unchanged and the
    # env sensitivity is learned in stage 2 where real frames supply them
    nn = init_mlp(ki, hidden=hidden, vconst=float(cpl_params_row[0]),
                  dtype=dtype, n_env=n_env)
    opt = optax.adam(optax.cosine_decay_schedule(lr, steps))
    opt_state = opt.init(nn)

    def loss_fn(params):
        pred = jax.vmap(lambda a, b: apply_mlp(params, a, b))(q2, roo)
        return jnp.mean((pred - labels) ** 2)

    @jax.jit
    def update(params, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        # vconst is frozen in stage 1 (degenerate with output scale)
        g["vconst"] = jnp.zeros_like(g["vconst"])
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(steps):
        nn, opt_state, loss = update(nn, opt_state)
    return nn, float(jnp.sqrt(loss))


def adiabatic_energy(x, box, topo, system, pairs, cbw, full_idx):
    """Adiabatic ground-state energy only -- the training objective.

    Mirrors the inner `etot` of `hamiltonian.adiabatic_energy_force`
    without the position-force VJP (dead weight in a parameter-training
    loss): E = c.H.c with the eigenvector under stop_gradient, so
    dE/d(nn params) is the exact Hellmann-Feynman derivative c.dH.c."""
    from ..evb.enumerate import molecule_com
    from ..ops import ground_state as gs
    com = jax.lax.stop_gradient(molecule_com(x, topo, system.mass, box))
    dset = _ham.enumerate_diabats(x, box, topo, system, full_idx=full_idx,
                                  com=com)
    batch = _ham.build_diabat_topologies(topo, dset, system)
    H, _, _, _ = _ham.assemble_hamiltonian(x, box, batch, system, pairs,
                                           cbw, topo.charge, topo, full_idx,
                                           com0=com)
    _, c = gs.ground_state_eigh(jax.lax.stop_gradient(H))
    c = jax.lax.stop_gradient(c)
    return c @ H @ c


def make_frame_energy_fn(system, topo, box, cbw):
    """Vmapped adiabatic ground-state energy over a batch of frames.

    Returns energies(nn_params, xs, full_idxs, pair_j, pair_mask) with
    xs (F, N, 3); neighbor views are stacked per frame (same capacity)."""

    def one(nn_params, x, full_idx, j, mask):
        sys_nn = system.replace(
            evb=system.evb.replace(nn_params=nn_params))
        i = jnp.arange(x.shape[0], dtype=jnp.int32)[:, None]
        return adiabatic_energy(x, box, topo, sys_nn, (i, j, mask), cbw,
                                full_idx)

    return jax.vmap(one, in_axes=(None, 0, 0, 0, 0))


def make_frame_energy_force_fn(system, topo, box, cbw):
    """Vmapped (energy, forces) over frames -- the force-matching view.

    The force is the exact Hellmann-Feynman position gradient of the
    adiabatic energy; differentiating the force-matching loss w.r.t. the
    MLP parameters then takes d(force)/d(params) THROUGH the engine (a
    forward-over-reverse second derivative of the whole reactive
    pipeline), which is the canonical ab-initio MD training objective."""

    def one(nn_params, x, full_idx, j, mask):
        sys_nn = system.replace(
            evb=system.evb.replace(nn_params=nn_params))
        i = jnp.arange(x.shape[0], dtype=jnp.int32)[:, None]

        def e_of_x(xx):
            return adiabatic_energy(xx, box, topo, sys_nn, (i, j, mask),
                                    cbw, full_idx)

        e, g = jax.value_and_grad(e_of_x)(x)
        return e, -g

    return jax.vmap(one, in_axes=(None, 0, 0, 0, 0))


def finetune_adiabatic(nn, system, topo, box, cbw, xs, full_idxs,
                       pair_j, pair_mask, e_ref, steps=60, lr=1e-3,
                       f_ref=None, force_weight=0.1):
    """Stage 2: descend the whole-frame objective through the full
    reactive engine.  Energy-only by default; with f_ref (F, N, 3) the
    loss adds force matching,

        L = mean (E - e_ref)^2 + w * mean |F - f_ref|^2 * 3N,

    (w in (kJ/mol)^2 per (kJ/mol/A)^2; the 3N restores comparable scale
    between the one energy residual and the 3N force residuals).
    Returns (nn_params, rmse_before, rmse_after) of the ENERGY residual;
    with f_ref the force RMSE before/after is appended:
    (nn, e_rmse0, e_rmse1, f_rmse0, f_rmse1)."""
    energies = make_frame_energy_fn(system, topo, box, cbw)
    ef = make_frame_energy_force_fn(system, topo, box, cbw) \
        if f_ref is not None else None
    opt = optax.adam(lr)
    opt_state = opt.init(nn)

    def e_loss(params):
        e = energies(params, xs, full_idxs, pair_j, pair_mask)
        return jnp.mean((e - e_ref) ** 2)

    def f_mse(params):
        _, f = ef(params, xs, full_idxs, pair_j, pair_mask)
        return jnp.mean(jnp.sum((f - f_ref) ** 2, axis=-1))

    def loss_fn(params):
        if f_ref is None:
            return e_loss(params)
        e = energies(params, xs, full_idxs, pair_j, pair_mask)
        n3 = 3.0 * xs.shape[1]
        return jnp.mean((e - e_ref) ** 2) + force_weight * n3 * f_mse(params)

    @jax.jit
    def update(params, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rmse0 = float(jnp.sqrt(e_loss(nn)))
    f0 = float(jnp.sqrt(f_mse(nn) / 3.0)) if f_ref is not None else None
    for _ in range(steps):
        nn, opt_state, _ = update(nn, opt_state)
    rmse1 = float(jnp.sqrt(e_loss(nn)))
    if f_ref is None:
        return nn, rmse0, rmse1
    f1 = float(jnp.sqrt(f_mse(nn) / 3.0))
    return nn, rmse0, rmse1, f0, f1


def finetune_heldout(nn, system, topo, box, cbw, xs, full_idxs, pair_j,
                     pair_mask, e_ref, split=0.75, steps=60, lr=1e-3):
    """Stage-2 finetuning WITH a held-out validation set: the first
    `split` fraction of frames trains (finetune_adiabatic), the remainder
    is never seen by the optimizer, and the returned report carries both
    residuals -- the transferability evidence a surface fit alone cannot
    give.  Returns (nn, report) with report = {train_rmse_before/after,
    test_rmse_before/after, n_train, n_test} in kJ/mol."""
    F = xs.shape[0]
    n_tr = max(1, min(F - 1, int(round(F * split))))
    tr = slice(0, n_tr)
    te = slice(n_tr, F)

    energies = make_frame_energy_fn(system, topo, box, cbw)

    def rmse(params, sl):
        e = energies(params, xs[sl], full_idxs[sl], pair_j[sl],
                     pair_mask[sl])
        return float(jnp.sqrt(jnp.mean((e - e_ref[sl]) ** 2)))

    test0 = rmse(nn, te)
    nn, tr0, tr1 = finetune_adiabatic(
        nn, system, topo, box, cbw, xs[tr], full_idxs[tr], pair_j[tr],
        pair_mask[tr], e_ref[tr], steps=steps, lr=lr)
    report = {"train_rmse_before": tr0, "train_rmse_after": tr1,
              "test_rmse_before": test0, "test_rmse_after": rmse(nn, te),
              "n_train": n_tr, "n_test": F - n_tr}
    return nn, report
