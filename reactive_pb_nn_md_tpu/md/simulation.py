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

from ..io.gro import (read_gro, format_gro_frame, GroFrame,
                      read_last_gro_frame, frame_step,
                      format_velocity_checkpoint, read_velocity_checkpoint)
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
        # per-atom force dump at every output step (print_forces analog,
        # general_routines.f90:950-991; its call is commented out in the
        # reference, md_integration.f90:503-505 -- here it is an opt-in
        # path, --dump-forces on the CLI)
        self.dump_forces_path = None

        # text velocity checkpoint (the reference's format, written
        # alongside the .npz so a run can be continued by EITHER engine)
        self.text_chk = (checkpoint_file[:-4]
                         if checkpoint_file.endswith(".npz")
                         else checkpoint_file + ".vel")

        # ---- restart auto-detect (check_restart_trajectory semantics,
        # general_routines.f90:37-115): prefer the bit-exact .npz; fall
        # back to trajectory tail + TEXT velocity checkpoint (so a run
        # started under the Fortran engine can be resumed here)
        self.restart = (os.path.exists(traj_file)
                        and os.path.exists(checkpoint_file))
        self.text_restart = (not self.restart
                             and os.path.exists(traj_file)
                             and os.path.exists(log_file)
                             and os.path.exists(self.text_chk)
                             and os.path.getsize(self.text_chk) > 0)

        if self.text_restart:
            frame = read_last_gro_frame(traj_file)
            step_traj = frame_step(frame)
            step_vel, v_restart = read_velocity_checkpoint(self.text_chk)
            # the reference hard-stops on a step mismatch (:85-93)
            if step_traj != step_vel or step_vel <= 0:
                raise ValueError(
                    f"error restarting trajectory: last step differs "
                    f"between trajectory ({step_traj}) and velocity "
                    f"checkpoint ({step_vel})")
            if v_restart.shape[0] != frame.n_atoms:
                raise ValueError("velocity checkpoint atom count does not "
                                 "match the trajectory frame")
        else:
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
            # Kahan carries (present iff the run used compensated_sum):
            # restored below so compensated restarts stay bit-exact
            if "comp_x" in chk.files:
                self._chk_comp = (np.asarray(chk["comp_x"]),
                                  np.asarray(chk["comp_v"]))
        elif self.text_restart:
            # statistical continuation (reference semantics: positions from
            # the trajectory tail, velocities from the text checkpoint, RNG
            # reseeded)
            state = State(x=jnp.asarray(frame.xyz, fdt),
                          v=jnp.asarray(v_restart, fdt),
                          box=jnp.asarray(frame.box, fdt),
                          key=key,
                          step=jnp.asarray(step_vel, jnp.int32))
            self.start_step = step_vel
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
        # verlet_allpairs (glob_v.f90:43) forces the dense O(N^2) build
        # (the reference's all-pairs fallback, general_routines.f90:1356)
        self.cells = () if self.cfg.verlet_allpairs else \
            neighbors.suggest_cells(self.system.n_atoms,
                                    np.asarray(state.box),
                                    self.system.verlet_cutoff)
        self.react_cap = None     # density default; grown on overflow
        self.react_cells = None
        self.ms = integrators.initial_md_state(
            state, topo, self.system, self.cbw, self.capacity, self.cells)
        self.react_cap = self.ms.nlist.react_cap or None
        self.react_cells = self.ms.nlist.react_cells or None
        self._retry_capacity_if_overflow()
        if getattr(self, "_chk_comp", None) and self.ms.comp is not None:
            cx, cv = self._chk_comp
            self.ms = self.ms.replace(comp=self.ms.comp.replace(
                x=jnp.asarray(cx, self.ms.comp.x.dtype),
                v=jnp.asarray(cv, self.ms.comp.v.dtype)))

        self.barostat = None
        if self.cfg.ensemble == "NPT":
            self.barostat = MCBarostat(self.cfg.pressure,
                                       self.cfg.temperature,
                                       self.cfg.baroscale, self.cfg.seed)

    # ------------------------------------------------------------------
    def mutate_system(self, fn):
        """Apply fn(system) -> system before run(): the public hook for
        parameter-level surgery the file formats cannot express -- attach
        trained PB-NN coupling params (nn/train.py) with cpl_func=3, or a
        documented softening (run/presets.soften_for_hops).  Re-evaluates
        the initial force state under the new parameters so the first
        half-kick is consistent."""
        self.system = fn(self.system)
        self.ms = integrators.initial_md_state(
            self.ms.state, self.ms.topo, self.system, self.cbw,
            self.capacity, self.cells, react_cap=self.react_cap,
            react_cells=self.react_cells)
        self._retry_capacity_if_overflow()

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
            if self.react_cells:
                # the fine react cell table's per-cell capacity (on-demand
                # adjacency path; same shared flag)
                rn1, rn2, rn3, rcc = self.react_cells
                self.react_cells = (rn1, rn2, rn3, int(rcc * 1.5) + 4)
            if self.system.rs_cells:
                # grow the fused pair kernel's per-cell capacity too (the
                # flag is shared; growing both is harmless)
                n1, n2, n3, rcap = self.system.rs_cells
                self.system = self.system.replace(
                    rs_cells=(n1, n2, n3, -(-int(rcap * 1.3 + 8) // 8) * 8))
            if self.system.pme_scap:
                # and the PME slab-spread capacity (same shared flag).
                # Multiplicative growth: a melting lattice transiently
                # concentrates whole planes into single slabs (measured
                # ~2.7x the equilibrated mean on the 10k box), and +16
                # per round chased that for many recompiles
                self.system = self.system.replace(
                    pme_scap=-(-int(self.system.pme_scap * 1.3 + 16) // 8) * 8)
            self.ms = integrators.initial_md_state(
                self.ms.state, self.ms.topo, self.system, self.cbw,
                self.capacity, self.cells, react_cap=self.react_cap,
                react_cells=self.react_cells)
            if self.capacity >= self.system.n_atoms - 1:
                break

    def _grow_evb_states(self):
        """Regrow evb_max_states on diabat overflow (the neighbor-capacity
        pattern applied to the state cap; the reference instead hard-stops,
        ms_evb.f90:3107-3123).  Returns False at the configured ceiling."""
        S = self.system.evb_max_states
        hard = self.cfg.evb_hard_max_states
        if S >= hard:
            return False
        new_s = min(hard, max(S * 2, S + 8))
        self.system = self.system.replace(evb_max_states=new_s)
        return True

    def _open_outputs(self):
        mode = "a" if (self.restart or self.text_restart) else "w"
        if mode == "w" and self.cfg.checkpoint_velocity \
                and os.path.exists(self.text_chk):
            open(self.text_chk, "w").close()    # fresh run: drop stale blocks
        self.traj_f = open(self.files["traj"], mode)
        self.log_f = open(self.files["log"], mode)
        self.hop_f = open(self.files["hop"], mode)
        # the A-file (8th CLI file, main_ms_evb.f90:51-53): Zundel geometry
        # + A factor stream, written at debug >= 2
        self.a_f = open(self.files["a"], mode)

    def _mol_names_natom(self, topo):
        names = [self.system.mt.mtype_names[int(t)]
                 for t in np.asarray(topo.mol_mtype)]
        natom = np.asarray(topo.mol_natom)
        return names, natom

    def _atom_names_ordered(self, topo):
        """Atom names in global order for the current topology."""
        types = np.asarray(topo.atom_type)
        return [self.system.ff.atype_names[t] for t in types]

    def _atom_order(self, topo):
        """Atoms in molecule-slot order (reference writes molecule
        blocks).  One masked ravel of the (M, A) table -- row-major
        already is molecule-major, slot-ascending; the former
        per-molecule Python loop was O(M) per output step and visible at
        10^4 atoms with frequent output."""
        ma = np.asarray(topo.mol_atoms).ravel()
        return ma[ma >= 0]

    def _write_frame(self, step):
        topo = self.ms.topo
        names, natom = self._mol_names_natom(topo)
        order = self._atom_order(topo)
        x = np.asarray(self.ms.state.x)[order]
        anames = np.asarray(self.system.ff.atype_names)[
            np.asarray(topo.atom_type)[order]].tolist()
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
            from ..evb import analysis
            c = np.asarray(ms.eigenvector)
            n = int(ms.n_states)
            line += (f" diabats {n} max_ci2 {float(np.max(c ** 2)):8.5f} "
                     f"hydronium_mol {int(ms.topo.hydronium_mol) + 1}\n")
            # per-diabat block (print_evb_trajectory_data,
            # ms_evb.f90:3128-3162): each diabat's acid molecule, c_i^2,
            # solvation shell
            rows = analysis.diabat_report(ms.hydronium_of, ms.n_hops_of,
                                          ms.eigenvector, ms.n_states)
            line += analysis.format_diabat_report(step, rows)
        if self.system.ms_evb and self.cfg.debug >= 2:
            # H-bond environment of the hydronium (get_h3o_network analog)
            from ..evb import analysis
            n_acc, n_don = analysis.hbond_network(
                ms.state.x, ms.state.box, ms.topo, self.system)
            self.hop_f.write(f"step {step} number of acceptors {n_acc} "
                             f"number of donors {n_don}\n")
            self.hop_f.flush()
            self._write_a_file(step)
        self.log_f.write(line)
        self.log_f.flush()

    def _write_a_file(self, step):
        """debug=2 A-file stream: Zundel geometry + geometric factor A of
        every non-principle diabat (write_geometry, ms_evb.f90:3828-3848;
        call site :1079-1081).

        This re-enumerates the diabat set ON HOST, outside the jitted
        step -- acceptable for a debug stream, and guaranteed never to
        run in production: the only call site is gated on debug >= 2
        (see _log_step above)."""
        from ..evb import analysis
        from ..evb.enumerate import enumerate_diabats
        from ..evb.topology_ops import build_diabat_topologies
        import jax
        ms = self.ms
        ridx = ms.nlist.react_tab if ms.nlist.react_tab is not None else (
            ms.nlist.react_idx if ms.nlist.react_idx is not None
            else ms.nlist.full_idx)
        dset = enumerate_diabats(ms.state.x, ms.state.box, ms.topo,
                                 self.system, full_idx=ridx)
        batch = build_diabat_topologies(ms.topo, dset, self.system)
        hop_log = np.asarray(dset.hop_log)
        n_hops = np.asarray(dset.n_hops)
        self.a_f.write(f"step {step}\n")
        for s in range(1, int(dset.n_states)):
            last = max(int(n_hops[s]) - 1, 0)
            hop = hop_log[s, last]
            topo_d = jax.tree_util.tree_map(lambda arr: arr[s], batch.topo)
            a_fac, dn, dx, an, ax = analysis.zundel_diagnostics(
                ms.state.x, ms.state.box, topo_d, self.system,
                int(hop[0]), int(hop[3]), int(hop[1]),
                d_heavy=int(hop[2]), a_heavy=int(hop[4]))
            self.a_f.write(analysis.format_zundel_geometry(
                a_fac, dn, dx, an, ax))
        self.a_f.flush()

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
        # reference-format text block (appended, like
        # print_velocities_checkpoint) -- atoms in molecule-slot order to
        # match the trajectory frames
        names, natom = self._mol_names_natom(topo)
        order = self._atom_order(topo)
        v = np.asarray(self.ms.state.v)[order]
        anames = np.asarray(self.system.ff.atype_names)[
            np.asarray(topo.atom_type)[order]].tolist()
        with open(self.text_chk, "a") as fh:
            fh.write(format_velocity_checkpoint(step, names, natom,
                                                anames, v))
        extra = {}
        if self.ms.comp is not None:
            extra["comp_x"] = np.asarray(self.ms.comp.x)
            extra["comp_v"] = np.asarray(self.ms.comp.v)
        np.savez(self.files["chk"],
                 x=np.asarray(self.ms.state.x),
                 v=np.asarray(self.ms.state.v),
                 box=np.asarray(self.ms.state.box),
                 key=np.asarray(self.ms.state.key),
                 step=step,
                 **extra,
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
        return min(p, 128)

    def run(self, n_steps=None, quiet=False):
        """Host loop around scanned device chunks.

        One device dispatch covers all steps to the next host-interaction
        boundary (output/checkpoint/barostat); per-step diagnostics (hop
        events, overflow flags) come back as stacked scalars."""
        cfg = self.cfg
        n_steps = n_steps if n_steps is not None else cfg.n_step
        self._open_outputs()

        if not (self.restart or self.text_restart):
            self._log_header()
            self._log_step(self.start_step)
            self._write_frame(self.start_step)

        ensemble = "NVT" if cfg.ensemble == "NVT" else cfg.ensemble
        t0 = time.time()
        step = self.start_step
        end = self.start_step + n_steps
        abort = False
        skip_baro = False
        while step < end and not abort:
            if self.barostat is not None and step % cfg.barofreq == 0 \
                    and step > self.start_step and not skip_baro:
                self.ms, self.cbw = self.barostat.attempt(
                    self.ms, self.system, self.cbw)
            skip_baro = False

            chunk = self._next_chunk(step, end)
            prev_h = int(self.ms.topo.hydronium_mol)
            ms_prev = self.ms
            self.ms, diag = integrators.md_scan(
                self.ms, self.system, self.cbw, cfg.delta_t, ensemble,
                chunk, cfg.friction_coeff, cfg.temperature)

            # diabat overflow: the state set was truncated mid-chunk, which
            # changes the adiabatic surface -- regrow the cap, restore the
            # pre-chunk state and REPLAY the chunk (hard-abort only at the
            # ceiling; reference behavior ms_evb.f90:3107-3123)
            eo = np.asarray(diag.evb_overflow)
            if self.system.ms_evb and eo.any():
                if self._grow_evb_states():
                    self.log_f.write(
                        f"step {step}: diabat enumeration exceeded the "
                        f"state cap; evb_max_states regrown to "
                        f"{self.system.evb_max_states}, chunk replayed\n")
                    self.log_f.flush()
                    self.ms = integrators.initial_md_state(
                        ms_prev.state, ms_prev.topo, self.system, self.cbw,
                        self.capacity, self.cells, react_cap=self.react_cap,
                        react_cells=self.react_cells)
                    self._retry_capacity_if_overflow()
                    skip_baro = True
                    continue
                bad = step + int(np.nonzero(eo)[0][0]) + 1
                self.log_f.write(
                    f"step {bad}: diabat enumeration exceeded "
                    f"evb_hard_max_states={self.cfg.evb_hard_max_states} "
                    f"-- aborting (reference behavior, "
                    f"ms_evb.f90:3107-3123)\n")
                self.log_f.flush()
                abort = True

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
                if self.dump_forces_path:
                    self.dump_forces(self.dump_forces_path, step)
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
        self.a_f.close()
        return elapsed
