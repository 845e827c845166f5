"""Command-line driver.

Same 8-positional-file contract as the reference binary
(sort_input_files, general_routines.f90:16-27; main_ms_evb.f90:15-122):

    python -m reactive_pb_nn_md_tpu.run.cli \
        in.gro ff.pmt topology.top sim.pmt traj.out log.out hop.out A.out
"""

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="reactive_pb_nn_md_tpu",
        description="TPU-native reactive MS-EVB molecular dynamics")
    p.add_argument("gro", help="input coordinates (.gro, nm)")
    p.add_argument("ffpmt", help="force-field parameter file (.pmt)")
    p.add_argument("top", help="topology file (.top)")
    p.add_argument("simpmt", help="simulation parameter file (.pmt)")
    p.add_argument("traj", help="output trajectory (.gro frames)")
    p.add_argument("log", help="output log file")
    p.add_argument("hop", help="output proton-hop event file")
    p.add_argument("afile", help="output A-factor/debug geometry file")
    p.add_argument("--platform", default=None,
                   help="jax platform override (cpu / tpu)")
    p.add_argument("--steps", type=int, default=None,
                   help="override n_step from the parameter file")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax profiler trace of the run into DIR "
                        "(the step is one compiled program, so per-phase "
                        "timing comes from the XLA profile; replaces the "
                        "reference's debug=1 wall-clock brackets)")
    p.add_argument("--dump-forces", default=None, metavar="PATH",
                   help="append a per-atom force dump to PATH at every "
                        "output step (print_forces analog, "
                        "general_routines.f90:950-991)")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    else:
        # fp64 physics needs f64 FFTs (complex128), which TPU lacks; route
        # those runs to CPU up front.  Env-var JAX_PLATFORMS is NOT enough
        # on stacks whose plugin overrides it -- use the config key.
        from ..io.simpmt import read_sim_params
        if read_sim_params(args.simpmt).precision == "fp64":
            jax.config.update("jax_platforms", "cpu")

    from ..md.simulation import Simulation

    sim = Simulation(args.gro, args.ffpmt, args.top, args.simpmt,
                     args.traj, args.log, args.hop, args.afile)
    if args.dump_forces:
        sim.dump_forces_path = args.dump_forces
        open(args.dump_forces, "w").close()      # fresh dump each run
    n = args.steps if args.steps is not None else sim.cfg.n_step
    if args.profile:
        with jax.profiler.trace(args.profile):
            elapsed = sim.run(n)
    else:
        elapsed = sim.run(n)
    print(f"completed {n} steps in {elapsed:.2f} s "
          f"({n / max(elapsed, 1e-9):.2f} steps/s)")


if __name__ == "__main__":
    main()
