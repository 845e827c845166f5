"""Monte-Carlo barostat for NPT (monte_carlo_barostat,
md_integration.f90:231-386).

Runs host-side every `barofreq` steps (it is inherently sequential and
rare); all heavy work (energy evaluation, CB rebuild, neighbor rebuild) is
the same jitted device code as the MD step.  Semantics preserved:

  * random isotropic box-length change within +/- baroscale * L;
  * molecule positions scaled about their centers of mass;
  * Metropolis weight  w = dE + p dV - 3 N kT ln(L'/L);
  * a proton hop during the trial forces acceptance (:320-323);
  * baroscale adapts toward 25-75% acceptance every 10 trials (:374-384).

The reference's static save buffers capped NPT at 10000 atoms / 10 atoms
per molecule (:247-248, :404); no such caps here.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import KB, CONV_BAR_KJMOLA3
from ..models import pme
from ..ops import neighbors
from . import integrators


class MCBarostat:
    def __init__(self, pressure, temperature, baroscale=0.01, seed=0):
        self.pressure = pressure
        self.temperature = temperature
        self.baroscale = baroscale
        self.n_trials = 0
        self.n_accept = 0
        self.rng = np.random.default_rng(seed + 777)

    def attempt(self, ms: integrators.MDState, system, cbw):
        """One MC volume move.  Returns (new MDState, new cbw)."""
        box = np.asarray(ms.state.box)
        if not np.allclose(np.diag(np.diag(box)), box):
            raise ValueError("MC barostat requires a cubic box")
        L = float(box[0, 0])
        self.n_trials += 1

        dL = L * self.baroscale * (self.rng.uniform() * 2.0 - 1.0)
        newL = L + dL
        scale = newL / L

        # scale molecule positions about their COM
        from ..evb.enumerate import molecule_com
        x = ms.state.x
        com = molecule_com(x, ms.topo, system.mass, ms.state.box)
        new_com = com * scale
        x_new = x + (new_com - com)[ms.topo.atom_mol]
        new_box = ms.state.box * scale

        new_cbw = pme.cb_half(new_box, system.pme_grid, system.spline_order,
                              system.alpha_sqrt, dtype=x.dtype)
        nlist = neighbors.rebuild_like(ms.nlist, x_new, new_box,
                                       system.verlet_cutoff)

        state_new = ms.state.replace(x=x_new, box=new_box)
        eval_fn = (integrators.evaluate_forces
                   if jax.default_backend() == "cpu"
                   else integrators._evaluate_forces_jit)
        fe = eval_fn(x_new, new_box, ms.topo, system, nlist, new_cbw)

        kT = KB * self.temperature
        dE = float(fe.potential) - float(ms.potential)
        pV = CONV_BAR_KJMOLA3 * self.pressure * (newL ** 3 - L ** 3)
        S = system.n_mole * kT * 3.0 * np.log(scale)
        w = dE + pV - S
        if bool(fe.hopped):
            w = -1.0     # force acceptance across a proton hop

        accept = w < 0 or self.rng.uniform() <= np.exp(-w / kT)
        if accept:
            self.n_accept += 1
            # a box rescale invalidates any Kahan position carry (the
            # residuals refer to the pre-scale coordinates): restart them
            comp = ms.comp
            if comp is not None:
                comp = comp.replace(x=jnp.zeros_like(comp.x))
            ms = ms.replace(state=state_new, topo=fe.topo, nlist=nlist,
                            force=fe.force, potential=fe.potential,
                            breakdown=fe.breakdown, n_states=fe.n_states,
                            eigenvector=fe.eigenvector, hopped=fe.hopped,
                            evb_overflow=fe.evb_overflow,
                            hydronium_of=fe.hydronium_of,
                            n_hops_of=fe.n_hops_of, comp=comp)
            cbw = new_cbw

        if self.n_trials > 10:
            if self.n_accept < 0.25 * self.n_trials:
                self.baroscale /= 1.1
                self.n_trials = self.n_accept = 0
            elif self.n_accept > 0.75 * self.n_trials:
                self.baroscale *= 1.1
                self.n_trials = self.n_accept = 0

        return ms, cbw
