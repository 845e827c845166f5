"""Golden-parity harness vs the compiled Fortran reference.

The container has no ifort/gfortran/MKL (re-verified every round), so the
numeric replay of the reference cannot run HERE -- but a compiler-equipped
user can, and this harness gives both sides of the diff:

  dump   build a system from an input deck (the reference's own file
         formats) and write ONE MS-EVB evaluation to JSON: per-diabat
         Hamiltonian elements, the hop log that defines each diabat, the
         ground-state energy/eigenvector, adiabatic forces, and the
         non-reactive energy decomposition.  This is the engine-side
         artifact, produced in-container.
  diff   compare two dump files (engine vs reference, or engine vs
         engine) at stated tolerances, matching diabats by their hop
         signature (donor molecule -> acceptor molecule chain) rather
         than by enumeration order -- the reference discovers states
         depth-first (ms_evb.f90:498-607), this engine breadth-first, so
         row order differs legitimately.
  check-toolchain   report whether a Fortran toolchain exists; exits 0
         with SKIP when absent (the in-container path).

Reference-side recipe (for a machine with ifort+MKL, or gfortran+MKL):
see docs/PARITY.md -- it pins the build flags (src/Makefile:13-38), the
deck layout (8 positional args, main_ms_evb.f90:15-122), and the exact
insertion points (file:line) where ~20 original print statements expose
H(i,j), the hop log, and the adiabatic force in this schema.  No
reference source is reproduced there, only coordinates into it.

Tolerances (BASELINE.json targets + table-interpolation error analysis,
SURVEY §7 "hard parts" item 4):
  H diagonal / energies : 1e-3 kJ/mol relative  (erfc table error ~1e-6
                          relative enters through the Ewald real space)
  H off-diagonal        : 1e-3 kJ/mol absolute
  adiabatic forces      : 1e-4 kJ/mol/A absolute per component
"""

import argparse
import json
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tests"))


def engine_dump(gro, ff, top, sim, out_path=None, platform="cpu"):
    """One MS-EVB evaluation on the deck -> schema dict (optionally
    written to out_path as JSON)."""
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from reactive_pb_nn_md_tpu.io.gro import read_gro
    from reactive_pb_nn_md_tpu.io.ffpmt import read_ffpmt
    from reactive_pb_nn_md_tpu.io.topfile import read_top
    from reactive_pb_nn_md_tpu.io.simpmt import read_sim_params
    from reactive_pb_nn_md_tpu.topology import build_system, State
    from reactive_pb_nn_md_tpu.models import pme
    from reactive_pb_nn_md_tpu.ops import neighbors
    from reactive_pb_nn_md_tpu.md import integrators
    from reactive_pb_nn_md_tpu.evb import hamiltonian as ham

    frame = read_gro(gro)
    cfg = read_sim_params(sim)
    system, topo = build_system(frame, read_ffpmt(ff), read_top(top), cfg)
    fdt = jnp.float64
    state = State(x=jnp.asarray(frame.xyz, fdt),
                  v=jnp.zeros_like(jnp.asarray(frame.xyz, fdt)),
                  box=jnp.asarray(frame.box, fdt),
                  key=jax.random.PRNGKey(0),
                  step=jnp.asarray(0, jnp.int32))
    cbw = pme.cb_half(state.box, system.pme_grid, system.spline_order,
                      system.alpha_sqrt, dtype=fdt)
    cap = neighbors.suggest_capacity(
        system.n_atoms, abs(float(np.linalg.det(np.asarray(frame.box)))),
        system.verlet_cutoff)
    nlist = neighbors.build_neighbors(state.x, state.box,
                                      system.verlet_cutoff, cap)
    pairs = neighbors.neighbor_pairs(nlist)
    if not system.ms_evb:
        raise SystemExit("deck is not an MS-EVB simulation "
                         "(ms_evb_simulation no)")
    res, batch = ham.adiabatic_energy_force(
        state.x, state.box, topo, system, pairs, cbw,
        full_idx=nlist.full_idx, react_idx=nlist.react_idx)
    S = int(np.asarray(res.n_states))
    H = np.asarray(res.hamiltonian, np.float64)[:S, :S]
    hop_log = np.asarray(batch.dset.hop_log)[:S]
    hyd_of = np.asarray(res.hydronium_of)[:S]
    n_hops = np.asarray(batch.dset.n_hops)[:S]

    # diabat signature: the molecule chain of its hops (donor mol ->
    # acceptor mol per hop; hop_log columns per evb/enumerate.py:
    # [donor_mol, proton_atom, donor_heavy, acceptor_mol, acceptor_heavy])
    # -- enumeration-order independent
    sigs = []
    for s in range(S):
        sig = []
        for h in range(int(n_hops[s])):
            sig.append([int(hop_log[s, h, 0]), int(hop_log[s, h, 3])])
        sigs.append(sig)

    bd = res.breakdown
    dump = {
        "schema": "reactive_pb_nn_md parity dump v1",
        "deck": {"gro": str(gro), "ff": str(ff), "top": str(top),
                 "sim": str(sim)},
        "n_atoms": system.n_atoms,
        "n_states": S,
        "hydronium_mol": int(np.asarray(topo.hydronium_mol)),
        "diabat_signature": sigs,
        "diabat_hydronium": hyd_of.tolist(),
        "H_kjmol": H.tolist(),
        "ground_energy_kjmol": float(np.asarray(res.energy)),
        "eigenvector": np.asarray(res.eigenvector, np.float64)[:S].tolist(),
        "force_kjmol_per_A": np.asarray(res.force, np.float64).tolist(),
        "breakdown": {k: float(np.asarray(getattr(bd, k)))
                      for k in ("elec", "vdw", "bond", "angle",
                                "dihedral")},
    }
    if out_path:
        pathlib.Path(out_path).write_text(json.dumps(dump))
    return dump


def _match_states(sig_a, sig_b):
    """Map diabat rows of A onto rows of B by hop signature; returns list
    `perm` with perm[i] = j or None."""
    keyed = {json.dumps(s): i for i, s in enumerate(sig_b)}
    return [keyed.get(json.dumps(s)) for s in sig_a]


def diff_dumps(a, b, tol_e_rel=1e-3, tol_h_abs=1e-3, tol_f_abs=1e-4,
               verbose=True):
    """Compare two dumps; returns (ok, report lines)."""
    import numpy as np
    rep = []
    ok = True

    def chk(cond, msg):
        nonlocal ok
        rep.append(("OK  " if cond else "FAIL") + " " + msg)
        ok = ok and cond

    chk(a["n_atoms"] == b["n_atoms"],
        f"n_atoms {a['n_atoms']} vs {b['n_atoms']}")
    chk(a["n_states"] == b["n_states"],
        f"n_states {a['n_states']} vs {b['n_states']}")
    perm = _match_states(a["diabat_signature"], b["diabat_signature"])
    chk(all(p is not None for p in perm),
        f"diabat signatures match ({sum(p is not None for p in perm)}"
        f"/{len(perm)})")
    Ha = np.asarray(a["H_kjmol"])
    Hb = np.asarray(b["H_kjmol"])
    if all(p is not None for p in perm) and Ha.shape == Hb.shape:
        p = np.asarray(perm)
        Hb2 = Hb[np.ix_(p, p)]
        dd = np.abs(np.diag(Ha) - np.diag(Hb2))
        rel = dd / np.maximum(1.0, np.abs(np.diag(Hb2)))
        chk(rel.max() < tol_e_rel,
            f"H diagonal rel err {rel.max():.2e} < {tol_e_rel}")
        off = ~np.eye(Ha.shape[0], dtype=bool)
        doff = np.abs(np.abs(Ha[off]) - np.abs(Hb2[off]))
        chk(doff.max() < tol_h_abs,
            f"|H offdiag| abs err {doff.max():.2e} < {tol_h_abs}")
    de = abs(a["ground_energy_kjmol"] - b["ground_energy_kjmol"])
    rel = de / max(1.0, abs(b["ground_energy_kjmol"]))
    chk(rel < tol_e_rel, f"ground energy rel err {rel:.2e} < {tol_e_rel}")
    Fa = np.asarray(a["force_kjmol_per_A"])
    Fb = np.asarray(b["force_kjmol_per_A"])
    if Fa.shape == Fb.shape:
        df = np.abs(Fa - Fb).max()
        chk(df < tol_f_abs, f"force abs err {df:.2e} < {tol_f_abs}")
    else:
        chk(False, f"force shape {Fa.shape} vs {Fb.shape}")
    for k, va in a["breakdown"].items():
        vb = b["breakdown"].get(k)
        if vb is not None:
            rel = abs(va - vb) / max(1.0, abs(vb))
            chk(rel < tol_e_rel, f"breakdown.{k} rel err {rel:.2e}")
    if verbose:
        print("\n".join(rep))
    return ok, rep


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("gro")
    d.add_argument("ff")
    d.add_argument("top")
    d.add_argument("sim")
    d.add_argument("--out", default="parity_engine.json")
    f = sub.add_parser("diff")
    f.add_argument("a")
    f.add_argument("b")
    f.add_argument("--tol-e-rel", type=float, default=1e-3)
    f.add_argument("--tol-h-abs", type=float, default=1e-3)
    f.add_argument("--tol-f-abs", type=float, default=1e-4)
    sub.add_parser("check-toolchain")
    args = ap.parse_args()

    if args.cmd == "check-toolchain":
        for c in ("ifort", "ifx", "gfortran"):
            if shutil.which(c):
                print(f"toolchain: {c} available -- see docs/PARITY.md "
                      "for the reference build recipe")
                return
        print("SKIP: no Fortran compiler in this environment -- the "
              "reference side of the parity diff cannot run here "
              "(docs/PARITY.md has the recipe for a compiler-equipped "
              "host; the engine-side dump still works: `dump ...`)")
        return

    if args.cmd == "dump":
        engine_dump(args.gro, args.ff, args.top, args.sim, args.out)
        print(f"engine dump -> {args.out}")
        return

    a = json.loads(pathlib.Path(args.a).read_text())
    b = json.loads(pathlib.Path(args.b).read_text())
    ok, _ = diff_dumps(a, b, args.tol_e_rel, args.tol_h_abs,
                       args.tol_f_abs)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
