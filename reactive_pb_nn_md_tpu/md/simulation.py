"""Simulation driver: orchestration, output, checkpoint/restart.

Maps the reference driver (main_ms_evb.f90:15-122) + output subsystem
(print_step general_routines.f90:870-901, .gro trajectory :906-945,
velocity checkpoint :997-1026, restart auto-detect :37-178) onto a host
loop around the jitted step.

Improvements over the reference checkpointing: the .npz checkpoint stores
positions, velocities, box, step, the PRNG key and the full dynamic
topology, so a restart is bit-exact (the reference reseeds the RNG from the
clock and restarts are only statistically continuous).
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..io.gro import read_gro, format_gro_frame, GroFrame
from ..io.ffpmt import read_ffpmt
from ..io.topfile import read_top
from ..io.simpmt import read_sim_params, SimConfig
from ..topology import build_system, State, Topology
from ..models import pme
from ..ops import neighbors
from ..utils.constants import KB
from . import integrators, velocities
from .barostat import MCBarostat

CHECKPOINT_FILE = "velocity_checkpoint.npz"


class Simulation:
    """Owns the host loop.  File contract identical to the reference CLI:
    in.gro ff.pmt top sim.pmt traj.out log.out hop.out A.out."""

    def __init__(self, gro_file, ff_file, top_file, sim_file,
                 traj_file, log_file, hop_file, a_file,
                 checkpoint_file=CHECKPOINT_FILE):
        self.cfg = read_sim_params(sim_file)
        self.files = dict(gro=gro_file, ff=ff_file, top=top_file,
                          sim=sim_file, traj=traj_file, log=log_file,
                          hop=hop_file, a=a_file, chk=checkpoint_file)

        # ---- restart auto-detect (check_restart_trajectory semantics):
        # resume iff trajectory + checkpoint both exist
        self.restart = (os.path.exists(traj_file)
                        and os.path.exists(checkpoint_file))

        frame = read_gro(gro_file)
        self.system, topo = build_system(
            frame, read_ffpmt(ff_file), read_top(top_file), self.cfg)
        self.frame0 = frame

        f = frame.xyz.dtype
        from ..utils.dtypes import default_float
        fdt = default_float()
        key = jax.random.PRNGKey(self.cfg.seed)

        if self.restart:
            chk = np.load(checkpoint_file)
            topo = Topology(
                mol_mtype=jnp.asarray(chk["mol_mtype"]),
                mol_natom=jnp.asarray(chk["mol_natom"]),
                mol_atoms=jnp.asarray(chk["mol_atoms"]),
                atom_mol=jnp.asarray(chk["atom_mol"]),
                atom_slot=jnp.asarray(chk["atom_slot"]),
                atom_type=jnp.asarray(chk["atom_type"]),
                charge=jnp.asarray(chk["charge"], fdt),
                hydronium_mol=jnp.asarray(chk["hydronium_mol"]))
            state = State(x=jnp.asarray(chk["x"], fdt),
                          v=jnp.asarray(chk["v"], fdt),
                          box=jnp.asarray(chk["box"], fdt),
                          key=jnp.asarray(chk["key"]),
                          step=jnp.asarray(int(chk["step"]), jnp.int32))
            self.start_step = int(chk["step"])
        else:
            key, vkey = jax.random.split(key)
            mobile = velocities.freeze_mask(self.system, topo)
            if frame.velocities is not None:
                v = jnp.asarray(frame.velocities, fdt)
            else:
                v = velocities.sample_velocities(
                    vkey, self.system.mass,
                    self.cfg.initial_temp, mobile)
            state = State(x=jnp.asarray(frame.xyz, fdt),
                          v=v, box=jnp.asarray(frame.box, fdt),
                          key=key, step=jnp.asarray(0, jnp.int32))
            self.start_step = 0

        self.cbw = pme.cb_half(state.box, self.system.pme_grid,
                               self.system.spline_order,
                               self.system.alpha_sqrt, dtype=fdt)
        vol = float(jnp.abs(jnp.linalg.det(np.asarray(state.box))))
        self.capacity = neighbors.suggest_capacity(
            self.system.n_atoms, vol, self.system.verlet_cutoff)
        self.cells = neighbors.suggest_cells(
            self.system.n_atoms, np.asarray(state.box),
            self.system.verlet_cutoff)
        self.react_cap = None     # density default; grown on overflow
        self.ms = integrators.initial_md_state(
            state, topo, self.system, self.cbw, self.capacity, self.cells)
        self.react_cap = self.ms.nlist.react_cap or None
        self._retry_capacity_if_overflow()

        self._evb_overflow_warned = False
        self.barostat = None
        if self.cfg.ensemble == "NPT":
            self.barostat = MCBarostat(self.cfg.pressure,
                                       self.cfg.temperature,
                                       self.cfg.baroscale, self.cfg.seed)

    # ------------------------------------------------------------------
    def _retry_capacity_if_overflow(self):
        # the overflow flag is shared by the half list, full adjacency,
        # reactive adjacency and cell buckets -- grow them all (they are
        # cheap relative to a silently truncated list)
        while bool(self.ms.nbr_overflow):
            self.capacity = min(int(self.capacity * 1.5) + 8,
                                self.system.n_atoms - 1)
            if self.cells:
                nc1, nc2, nc3, ccap = self.cells
                self.cells = (nc1, nc2, nc3, int(ccap * 1.5) + 4)
            if self.react_cap:
                self.react_cap = min(int(self.react_cap * 1.5) + 8,
                                     self.system.n_atoms - 1)
            self.ms = integrators.initial_md_state(
                self.ms.state, self.ms.topo, self.system, self.cbw,
                self.capacity, self.cells, react_cap=self.react_cap)
            if self.capacity >= self.system.n_atoms - 1:
                break

    def _open_outputs(self):
        mode = "a" if self.restart else "w"
        self.traj_f = open(self.files["traj"], mode)
        self.log_f = open(self.files["log"], mode)
        self.hop_f = open(self.files["hop"], mode)

    def _mol_names_natom(self, topo):
        names = [self.system.mt.mtype_names[int(t)]
                 for t in np.asarray(topo.mol_mtype)]
        natom = np.asarray(topo.mol_natom)
        return names, natom

    def _atom_names_ordered(self, topo):
        """Atom names in global order for the current topology."""
        types = np.asarray(topo.atom_type)
        return [self.system.ff.atype_names[t] for t in types]

    def _write_frame(self, step):
        topo = self.ms.topo
        names, natom = self._mol_names_natom(topo)
        # emit atoms in molecule-slot order (reference writes molecule blocks)
        order = np.concatenate([
            [a for a in np.asarray(topo.mol_atoms[m]) if a >= 0]
            for m in range(self.system.n_mole)]).astype(int)
        x = np.asarray(self.ms.state.x)[order]
        anames = [self.system.ff.atype_names[int(t)]
                  for t in np.asarray(topo.atom_type)[order]]
        self.traj_f.write(format_gro_frame(
            f"step {step}", names, natom, anames, x,
            np.asarray(self.ms.state.box)))
        self.traj_f.flush()

    def _log_header(self):
        """Run-settings summary (print_simulation_info analog,
        general_routines.f90:793-868)."""
        cfg = self.cfg
        s = self.system
        import jax
        lines = [
            "reactive_pb_nn_md_tpu simulation",
            f" ensemble {cfg.ensemble}  steps {cfg.n_step}  "
            f"dt(ps) {cfg.delta_t}  T(K) {cfg.temperature}",
            f" atoms {s.n_atoms}  molecules {s.n_mole}  "
            f"molecule types {len(s.mt.mtype_names)}",
            f" real_space_cutoff {s.real_space_cutoff}  "
            f"verlet_cutoff {s.verlet_cutoff}  alpha_sqrt {s.alpha_sqrt}",
            f" pme_grid {s.pme_grid}^3  spline_order {s.spline_order}  "
            f"n_exclusions {s.n_exclusions}",
            f" ms_evb {s.ms_evb}  evb_max_states {s.evb_max_states}  "
            f"evb_max_chain {s.evb_max_chain}",
            f" lj_comb_rule {cfg.lj_comb_rule}  precision {cfg.precision}  "
            f"device {jax.devices()[0]}",
            "",
        ]
        self.log_f.write("\n".join(lines))
        self.log_f.flush()

    def _log_step(self, step):
        ms = self.ms
        t_ps = step * self.cfg.delta_t
        bd = ms.breakdown
        line = (f"step {step:10d} time(ps) {t_ps:12.4f}\n"
                f" KE {float(ms.kinetic):14.6f} PE {float(ms.potential):14.6f}"
                f" Etot {float(ms.kinetic) + float(ms.potential):14.6f}\n"
                f" Eelec {float(bd.elec):14.6f} Evdw {float(bd.vdw):14.6f}"
                f" Ebond {float(bd.bond):12.6f} Eangle {float(bd.angle):12.6f}"
                f" Edihedral {float(bd.dihedral):12.6f}\n")
        if self.cfg.ensemble == "NPT":
            box = np.asarray(ms.state.box)
            vol = float(abs(np.linalg.det(box)))
            mass_tot = float(np.sum(np.asarray(self.system.mass)))
            dens = mass_tot / vol / 6.022e23 * 1e24  # g/cm^3
            line += f" volume(A^3) {vol:14.4f} density(g/cm3) {dens:10.6f}\n"
        if self.system.ms_evb and self.cfg.print_ms_evb_data:
            c = np.asarray(ms.eigenvector)
            n = int(ms.n_states)
            line += (f" diabats {n} max_ci2 {float(np.max(c ** 2)):8.5f} "
                     f"hydronium_mol {int(ms.topo.hydronium_mol) + 1}\n")
        if self.system.ms_evb and self.cfg.debug >= 2:
            # H-bond environment of the hydronium (get_h3o_network analog)
            from ..evb import analysis
            n_acc, n_don = analysis.hbond_network(
                ms.state.x, ms.state.box, ms.topo, self.system)
            self.hop_f.write(f"step {step} number of acceptors {n_acc} "
                             f"number of donors {n_don}\n")
            self.hop_f.flush()
        self.log_f.write(line)
        self.log_f.flush()

    def dump_forces(self, path, step):
        """Per-atom force dump (print_forces analog,
        general_routines.f90:950-991)."""
        f = np.asarray(self.ms.force)
        names = self._atom_names_ordered(self.ms.topo)
        with open(path, "a") as fh:
            fh.write(f"step {step}\n")
            for i, nm in enumerate(names):
                fh.write(f"{i + 1:6d} {nm:<5s} "
                         f"{f[i, 0]:14.6f} {f[i, 1]:14.6f} "
                         f"{f[i, 2]:14.6f}\n")

    def _checkpoint(self, step):
        topo = self.ms.topo
        np.savez(self.files["chk"],
                 x=np.asarray(self.ms.state.x),
                 v=np.asarray(self.ms.state.v),
                 box=np.asarray(self.ms.state.box),
                 key=np.asarray(self.ms.state.key),
                 step=step,
                 mol_mtype=np.asarray(topo.mol_mtype),
                 mol_natom=np.asarray(topo.mol_natom),
                 mol_atoms=np.asarray(topo.mol_atoms),
                 atom_mol=np.asarray(topo.atom_mol),
                 atom_slot=np.asarray(topo.atom_slot),
                 atom_type=np.asarray(topo.atom_type),
                 charge=np.asarray(topo.charge),
                 hydronium_mol=np.asarray(topo.hydronium_mol))

    # ------------------------------------------------------------------
    def _next_chunk(self, step, end):
        """Steps until the next host-interaction boundary (output,
        checkpoint, barostat, end of run)."""
        cfg = self.cfg
        n = end - step
        n = min(n, cfg.n_output - step % cfg.n_output)
        if cfg.checkpoint_velocity:
            n = min(n, cfg.checkpoint_velocity
                    - step % cfg.checkpoint_velocity)
        if self.barostat is not None:
            n = min(n, cfg.barofreq - step % cfg.barofreq)
        n = max(int(n), 1)
        # quantize to a power of two: every distinct scan length is a
        # separate XLA compilation (minutes on this TPU stack)
        p = 1
        while p * 2 <= n:
            p *= 2
        return min(p, 64)

    def run(self, n_steps=None, quiet=False):
        """Host loop around scanned device chunks.

        One device dispatch covers all steps to the next host-interaction
        boundary (output/checkpoint/barostat); per-step diagnostics (hop
        events, overflow flags) come back as stacked scalars."""
        cfg = self.cfg
        n_steps = n_steps if n_steps is not None else cfg.n_step
        self._open_outputs()

        if not self.restart:
            self._log_header()
            self._log_step(self.start_step)
            self._write_frame(self.start_step)

        ensemble = "NVT" if cfg.ensemble == "NVT" else cfg.ensemble
        t0 = time.time()
        step = self.start_step
        end = self.start_step + n_steps
        abort = False
        while step < end and not abort:
            if self.barostat is not None and step % cfg.barofreq == 0 \
                    and step > self.start_step:
                self.ms, self.cbw = self.barostat.attempt(
                    self.ms, self.system, self.cbw)

            chunk = self._next_chunk(step, end)
            prev_h = int(self.ms.topo.hydronium_mol)
            self.ms, diag = integrators.md_scan(
                self.ms, self.system, self.cbw, cfg.delta_t, ensemble,
                chunk, cfg.friction_coeff, cfg.temperature)

            hopped = np.asarray(diag.hopped)
            hyds = np.asarray(diag.hydronium)
            if self.system.ms_evb and hopped.any():
                for k in np.nonzero(hopped)[0]:
                    old = prev_h if k == 0 else int(hyds[k - 1])
                    self.hop_f.write(f"step  {step + int(k) + 1}\n proton "
                                     f"hop from {old + 1} to "
                                     f"{int(hyds[k]) + 1}\n")
                self.hop_f.flush()

            if np.asarray(diag.nbr_overflow).any():
                self._retry_capacity_if_overflow()
            eo = np.asarray(diag.evb_overflow)
            if eo.any() and not self._evb_overflow_warned:
                self._evb_overflow_warned = True
                bad = step + int(np.nonzero(eo)[0][0]) + 1
                self.log_f.write(
                    f"step {bad}: diabat enumeration exceeded "
                    f"evb_max_states={self.system.evb_max_states}; the "
                    f"state set is truncated (raise evb_max_states in the "
                    f"simulation parameter file; cf. ms_evb.f90:3107-3123)\n")
                self.log_f.flush()
            fo = np.asarray(diag.force_overflow)
            if fo.any():
                bad = step + int(np.nonzero(fo)[0][0]) + 1
                self.log_f.write(f"step {bad}: force magnitude exceeded "
                                 f"1e4 kJ/mol/A -- aborting (reference "
                                 f"behavior, md_integration.f90:523-526)\n")
                abort = True

            step += chunk
            if step % cfg.n_output == 0:
                self._log_step(step)
                self._write_frame(step)
            if cfg.checkpoint_velocity and \
                    step % cfg.checkpoint_velocity == 0:
                self._checkpoint(step)

        elapsed = time.time() - t0
        done = step - self.start_step
        if not quiet:
            self.log_f.write(f"completed {done} steps in {elapsed:.2f} s "
                             f"({done / max(elapsed, 1e-9):.2f} steps/s)\n")
        self.traj_f.close()
        self.log_f.close()
        self.hop_f.close()
        return elapsed
