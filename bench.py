"""Benchmark: MS-EVB reactive MD steps/second on the flagship configuration.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

Configuration: bulk water + one excess proton (hydronium MS-EVB3) -- the
"single excess proton in 216-water bulk box, PME 32^3" BASELINE.json config.
The full reactive step (neighbor check, diabat enumeration, per-diabat
energies, batched per-diabat PME, diagonalization, Hellmann-Feynman forces,
velocity Verlet) is one jitted program.

vs_baseline: the reference publishes no numbers and its Fortran/MKL
toolchain is unavailable in this container (BASELINE.md), so the ratio is
measured against this engine's own single-device CPU fp64 execution of the
identical step (run in a subprocess) -- a conservative stand-in for the
single-core baseline the targets are phrased against.
"""

import json
import os
import subprocess
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent / "tests"))

N_WATER = 215          # + 1 hydronium = 216 molecules, 649 atoms
PME_GRID = 32
# state-space cap: the reference's compile-time evb_max_states analog
# (glob_v.f90:60); bulk water uses ~20 states, the overflow flag guards the
# cap.  32 keeps the padded batch tight.
EVB_MAX_STATES = 32
WARMUP = 3
STEPS = 40
CPU_STEPS = 3


def run_bench(platform, precision, n_steps, warmup):
    """Times md_scan chunks; a value fetch per chunk forces real sync (the
    axon stack's block_until_ready is async-leaky)."""
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    if precision == "fp64":
        jax.config.update("jax_enable_x64", True)

    import __graft_entry__ as g
    g._enable_compile_cache()
    from reactive_pb_nn_md_tpu.md import integrators

    system, cbw, cfg, ms = g._build(n_water=N_WATER, pme_grid=PME_GRID,
                                    precision=precision,
                                    evb_max_states=EVB_MAX_STATES)
    chunk = max(1, min(n_steps, 20))

    def scan(ms):
        return integrators.md_scan(ms, system, cbw, cfg.delta_t, "NVE",
                                   chunk)

    for _ in range(max(1, warmup // chunk + 1)):
        ms, diag = scan(ms)
    float(diag.potential[-1])
    t0 = time.perf_counter()
    done = 0
    while done < n_steps:
        ms, diag = scan(ms)
        done += chunk
    pot = float(diag.potential[-1])
    dt = time.perf_counter() - t0
    import math
    assert math.isfinite(pot), "non-finite potential"
    assert not bool(diag.nbr_overflow.any()), "neighbor overflow"
    ms = ms.replace(n_states=diag.n_states[-1])
    return done / dt, system, ms


def main():
    if "--cpu-baseline" in sys.argv:
        rate, _, _ = run_bench("cpu", "fp64", CPU_STEPS, 1)
        print(f"CPU_BASELINE {rate:.6f}")
        return

    # CPU fp64 baseline in a subprocess (platforms can't switch in-process)
    cpu_rate = None
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--cpu-baseline"],
            capture_output=True, text=True, timeout=1800)
        for line in out.stdout.splitlines():
            if line.startswith("CPU_BASELINE"):
                cpu_rate = float(line.split()[1])
    except Exception as e:  # noqa: BLE001
        print(f"# cpu baseline failed: {e}", file=sys.stderr)

    # target device (default platform = the TPU under axon), fp32
    rate, system, ms = run_bench(None, "fp32", STEPS, WARMUP)

    import jax
    dev = str(jax.devices()[0])
    vs = rate / cpu_rate if cpu_rate else 1.0
    print(json.dumps({
        "metric": f"MS-EVB reactive MD steps/s ({system.n_atoms} atoms, "
                  f"216 molecules, PME {PME_GRID}^3, "
                  f"{int(ms.n_states)} diabats, {dev})",
        "value": round(rate, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
