"""Ground eigenpair of the small symmetric EVB Hamiltonian.

The reference diagonalizes the (n_diabat x n_diabat) H with a Numerical-
Recipes Jacobi sweep (jacobi, general_routines.f90:2013-2088) and takes the
minimum eigenvalue's vector (ms_evb.f90:281-287).  Only the ground eigenpair
is needed (the Hellmann-Feynman force uses c alone, and the energy is
c^T H c), so this module computes it directly with a shift-and-invert
Krylov subspace.

Measured on TPU v5e at the padded 32x32: jnp.linalg.eigh (QDWH) is FASTER
in the full scanned step (12.8 vs 16.8 ms/step) -- the sequential LU
factorizations/solves here cost more than one small QDWH.  The default
eigensolver is therefore "eigh"; this path stays as a tested alternative
that scales better for much larger state caps (QDWH is O(S^3) with a large
constant; the Krylov cost is a handful of O(S^2) solves):

  1. one LU factorization of (H - sigma I), sigma a Gershgorin lower bound
     (strictly below lambda_0, so the inverse operator amplifies the bottom
     of the spectrum) -- f32 LU is supported on TPU, fp64 LU is not;
  2. a k-dimensional Krylov basis from repeated lu_solve, orthonormalized
     by modified Gram-Schmidt with deterministic fallback directions when
     the start vector is already near-converged;
  3. Rayleigh-Ritz: project H into the basis and diagonalize the (k, k)
     matrix with a fixed-sweep round-robin Jacobi (small matmuls, no QDWH);
  4. one Rayleigh-quotient polish step (the solve is singular exactly at
     convergence, which is detected and the pre-polish vector kept).

Unlike plain inverse/Rayleigh iteration, the Krylov subspace captures
near-degenerate bottom clusters (the polynomial-best approximation over the
whole subspace), so a small ground-state gap cannot re-route the iteration
to an excited state.  The energy error is second order in the eigenvector
error (stationarity of the Rayleigh quotient); validated against eigh in
tests/test_ground_state.py including engineered near-degeneracies.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_robin_pairs(k):
    """Circle-method schedule: k-1 rounds of floor(k/2) disjoint (p, q)."""
    players = list(range(k)) + ([-1] if k % 2 else [])
    m = len(players)
    rest = players[1:]
    rounds = []
    for _ in range(m - 1):
        cur = [players[0]] + rest
        pairs = [(min(cur[i], cur[m - 1 - i]), max(cur[i], cur[m - 1 - i]))
                 for i in range(m // 2)
                 if cur[i] >= 0 and cur[m - 1 - i] >= 0]
        rounds.append(pairs)
        rest = rest[-1:] + rest[:-1]
    return rounds


@functools.partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(T, sweeps=8):
    """Fixed-sweep cyclic Jacobi for a small symmetric (k, k) matrix.

    Each round applies floor(k/2) disjoint Givens rotations as ONE (k, k)
    rotation matrix -- two small MXU matmuls -- instead of QDWH.  Cyclic
    Jacobi converges quadratically once sorted; `sweeps`=8 reaches fp32
    roundoff for k <= 32.  Returns (eigenvalues, eigenvectors as columns),
    unsorted (TPU analog of the reference jacobi's unsorted output).
    """
    k = T.shape[0]
    rounds = _round_robin_pairs(k)
    npairs = max(len(r) for r in rounds)
    pq = np.full((len(rounds), npairs, 2), 0, np.int32)
    valid = np.zeros((len(rounds), npairs), bool)
    for r, pairs in enumerate(rounds):
        for i, (p, q) in enumerate(pairs):
            pq[r, i] = (p, q)
            valid[r, i] = True
    pq = jnp.asarray(pq)
    valid = jnp.asarray(valid)
    eye = jnp.eye(k, dtype=T.dtype)
    n_rounds = len(rounds)

    def body(it, carry):
        T, V = carry
        r = jnp.mod(it, n_rounds)
        p = pq[r, :, 0]
        q = pq[r, :, 1]
        ok = valid[r]
        app = T[p, p]
        aqq = T[q, q]
        apq = jnp.where(ok, T[p, q], 0.0)
        theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
        c = jnp.cos(theta)
        s = jnp.sin(theta)
        J = eye.at[p, p].set(jnp.where(ok, c, 1.0))
        J = J.at[q, q].set(jnp.where(ok, c, 1.0))
        J = J.at[p, q].set(jnp.where(ok, s, 0.0))
        J = J.at[q, p].set(jnp.where(ok, -s, 0.0))
        T = J.T @ T @ J
        return T, V @ J

    T, V = jax.lax.fori_loop(0, sweeps * n_rounds, body, (T, eye))
    return jnp.diagonal(T), V


def ground_state(H, krylov=8, polish=2):
    """(lambda_0, c_0) of a symmetric (S, S) matrix (see module docstring)."""
    S = H.shape[0]
    f = H.dtype
    eye = jnp.eye(S, dtype=f)
    diag = jnp.diagonal(H)
    offsum = jnp.sum(jnp.abs(H), axis=1) - jnp.abs(diag)
    lower = jnp.min(diag - offsum)              # <= lambda_0 (Gershgorin)
    span = jnp.maximum(jnp.max(offsum), 1e-3 * (jnp.abs(lower) + 1.0))
    sigma = lower - 0.05 * span

    lu, piv = jax.scipy.linalg.lu_factor(H - sigma * eye)
    fallback_dirs = jnp.argsort(diag)           # deterministic restart dirs

    k = min(krylov, S)
    basis = []
    v = jax.nn.one_hot(jnp.argmin(diag), S, dtype=f)
    for i in range(k):
        if i > 0:
            v = jax.scipy.linalg.lu_solve((lu, piv), basis[-1])
        for u in basis:                         # modified Gram-Schmidt
            v = v - (u @ v) * u
        for u in basis:                         # second pass (fp32 hygiene)
            v = v - (u @ v) * u
        nrm = jnp.linalg.norm(v)
        fb = jax.nn.one_hot(fallback_dirs[i], S, dtype=f)
        for u in basis:
            fb = fb - (u @ fb) * u
        fbn = jnp.linalg.norm(fb)
        good = jnp.isfinite(nrm) & (nrm > 1e-5)
        v = jnp.where(good, v / jnp.where(good, nrm, 1.0),
                      fb / jnp.maximum(fbn, 1e-30))
        basis.append(v)
    V = jnp.stack(basis, axis=1)                # (S, k)

    T = V.T @ (H @ V)
    T = 0.5 * (T + T.T)
    w, y = jacobi_eigh(T)
    c = V @ y[:, jnp.argmin(w)]
    c = c / jnp.linalg.norm(c)

    for _ in range(polish):                     # Rayleigh-quotient polish
        lam = c @ (H @ c)
        ynew = jax.scipy.linalg.solve(H - lam * eye, c)
        nrm = jnp.linalg.norm(ynew)
        ok = jnp.all(jnp.isfinite(ynew)) & (nrm > 0)
        c = jnp.where(ok, ynew / jnp.where(nrm > 0, nrm, 1.0), c)
    lam = c @ (H @ c)
    return lam, c


def ground_state_eigh(H):
    """jnp.linalg.eigh with a spectral shift by the principle diagonal.

    The EVB H diagonal carries the FULL system energy (|H00| ~ 1e4
    kJ/mol for the flagship liquid) while the physics lives in O(100)
    couplings and O(100-1000) gaps; fp32 eigh accuracy is eps * ||H||,
    so solving (H - H00 I) instead of H moves the active block to O(gap)
    scale and buys ~1e4x relative precision on the mixing amplitudes
    (round-5 find: without the shift, the TPU fp32 path lost all
    adiabatic mixing at a Zundel crossing).  Exact in exact arithmetic:
    eigenvectors are shift-invariant."""
    shift = jax.lax.stop_gradient(H[0, 0])
    Hs = H - shift * jnp.eye(H.shape[0], dtype=H.dtype)
    w, v = jnp.linalg.eigh(Hs)
    g = jnp.argmin(w)
    return w[g] + shift, v[:, g]
