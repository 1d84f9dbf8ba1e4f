"""BMI/XMI-style runtime API for external couplers.

Behavioral parity targets (reference srcbmi/):
  - BMI core verbs  mf6bmi.f90:43-125: initialize / update / update_until /
    finalize, time queries (get_current_time, get_end_time, get_time_step)
  - variable access mf6bmi.f90:248-341: get_var_address + get_value /
    get_value_ptr / set_value keyed by memory-path-style addresses
    ("<MODEL>/X", "<MODEL>/NPF/K11", "<MODEL>/WEL/Q", ...)
  - XMI fine-grained loop  srcbmi/mf6xmi.F90:129-340: prepare_time_step /
    do_time_step / finalize_time_step and per-solution prepare_solve /
    solve / finalize_solve so callers can drive the Picard loop themselves
    (the xmipy / imod-coupler pattern).

The reference hands out raw Fortran pointers; here get_value returns the
current device array (zero-copy on device) and numpy views on request —
external code composes with the jitted step through ordinary JAX arrays.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .models.simulation import Simulation


class Mf6Api:
    """One simulation instance driven by BMI/XMI verbs."""

    def __init__(self):
        self._sim: Simulation | None = None
        self._walk = None
        self._head = None
        self._current = None      # (kper, kstp, delt, pertim, totim)
        self._totim = 0.0
        self._head_old = None
        self._solve_info = None

    # ------------------------------------------------------------- BMI core

    def initialize(self, sim_or_workspace):
        """Accepts a Simulation object or a workspace path containing
        mfsim.nam (the reference's config-file argument, mf6bmi.f90:66)."""
        if isinstance(sim_or_workspace, Simulation):
            self._sim = sim_or_workspace
        else:
            from .utils.mf6io.loader import load_simulation
            self._sim = load_simulation(str(sim_or_workspace))
        self._walk = iter(self._sim.tdis.walk())
        self._head = jnp.asarray(self._sim.model.strt)
        self._totim = 0.0
        return self

    def update(self) -> bool:
        """Advance one time step; returns False past the end of simulation
        (mf6bmi.f90:95 bmi_update)."""
        nxt = next(self._walk, None)
        if nxt is None:
            return False
        kper, kstp, delt, pertim, totim = nxt
        self._head = self._sim.do_step(self._head, kper, kstp, delt, pertim,
                                       totim)
        self._current = nxt
        self._totim = totim
        return True

    def update_until(self, t: float):
        while self._totim < t - 1e-12:
            if not self.update():
                break

    def finalize(self):
        self._sim.finish()

    # time queries
    def get_current_time(self) -> float:
        return self._totim

    def get_end_time(self) -> float:
        t = self._sim.tdis.total_time
        return t() if callable(t) else t

    def get_time_step(self) -> float:
        return self._current[2] if self._current else 0.0

    # --------------------------------------------------------- var access

    def get_var_address(self, var_name: str, component: str,
                        subcomponent: str = "") -> str:
        """Memory-path-style address (reference get_var_address)."""
        parts = [component.upper()]
        if subcomponent:
            parts.append(subcomponent.upper())
        parts.append(var_name.upper())
        return "/".join(parts)

    def _resolve(self, address: str):
        """Map an address to (container, attr, transform)."""
        parts = address.upper().split("/")
        model = self._sim.model
        if parts[0] != model.name.upper():
            raise KeyError(f"unknown component {parts[0]!r}")
        tail = parts[1:]
        if tail == ["X"]:
            return ("head", None)
        if tail == ["IBOUND"]:
            return ("ibound", None)
        if len(tail) == 2 and tail[0] == "NPF":
            return ("npf", tail[1].lower())
        if len(tail) == 2 and tail[0] == "STO":
            return ("sto", tail[1].lower())
        if len(tail) == 2:
            pkg = tail[0].lower()
            if getattr(model, pkg, None) is not None:
                return ("pkg", (pkg, tail[1].lower()))
        raise KeyError(f"unknown address {address!r}")

    def get_var_names(self):
        """Enumerate every addressable variable with shape/dtype — the
        memory manager's introspectable registry view (reference
        MemoryManager mem_write_usage / BMI get_input_var_names,
        mf6bmi.f90).  Returns [(address, shape, dtype), ...]."""
        import dataclasses as _dc

        model = self._sim.model
        pre = model.name.upper()
        out = [(f"{pre}/X", tuple(np.shape(self._head)), "float64"),
               (f"{pre}/IBOUND", tuple(np.shape(self._head)), "int32")]
        for comp, container in (("NPF", getattr(model, "npf_arrays",
                                                 None)),
                                ("STO", getattr(model, "sto_arrays",
                                                None))):
            if container is None:
                continue
            for f in _dc.fields(type(container)):
                v = getattr(container, f.name)
                if v is not None and hasattr(v, "shape"):
                    out.append((f"{pre}/{comp}/{f.name.upper()}",
                                tuple(v.shape), str(v.dtype)))
        for pkg in ("chd", "wel", "rch", "drn", "riv", "ghb", "evt"):
            data = getattr(model, pkg, None)
            if data is None:
                continue
            for f in _dc.fields(type(data)):
                v = getattr(data, f.name)
                if v is not None and hasattr(v, "shape"):
                    out.append((f"{pre}/{pkg.upper()}/{f.name.upper()}",
                                tuple(v.shape), str(v.dtype)))
        return out

    def get_value(self, address: str) -> np.ndarray:
        kind, spec = self._resolve(address)
        model = self._sim.model
        if kind == "head":
            return np.asarray(self._head)
        if kind == "ibound":
            ib, _ = model.boundary_state(self._head)
            return np.asarray(ib)
        if kind == "npf":
            return np.asarray(getattr(model.npf_arrays, spec))
        if kind == "sto":
            return np.asarray(getattr(model.sto_arrays, spec))
        pkg, field = spec
        return np.asarray(getattr(getattr(model, pkg), field))

    def set_value(self, address: str, value):
        """Write into live package/state data (reference set_value; the API
        package's externally-driven boundary pattern, gwf-api.f90:1-40)."""
        kind, spec = self._resolve(address)
        model = self._sim.model
        val = jnp.asarray(value)
        if kind == "head":
            self._head = jnp.asarray(np.broadcast_to(value, self._head.shape)
                                     .astype(np.float64))
            return
        if kind == "npf":
            model.npf_arrays = dataclasses.replace(
                model.npf_arrays, **{spec: val})
            return
        if kind == "sto":
            model.sto_arrays = dataclasses.replace(
                model.sto_arrays, **{spec: val})
            return
        if kind == "pkg":
            pkg, field = spec
            pdata = getattr(model, pkg)
            setattr(model, pkg, dataclasses.replace(pdata, **{field: val}))
            return
        raise KeyError(address)

    # grid metadata (mf6bmiGrid.f90 role)
    def get_grid_shape(self):
        return self._sim.model.grid.shape

    def get_grid_size(self):
        return self._sim.model.nodes

    # ------------------------------------------------------------ XMI loop

    def prepare_time_step(self):
        """XMI prepare_time_step (mf6xmi.F90:129): position at the next
        (kper, kstp) and latch head_old."""
        self._current = next(self._walk, None)
        if self._current is None:
            return False
        self._head_old = self._head
        return True

    def do_time_step(self):
        """XMI do_time_step: the full solve for the prepared step."""
        kper, kstp, delt, pertim, totim = self._current
        self._head = self._sim.do_step(self._head_old, kper, kstp, delt,
                                       pertim, totim)
        self._totim = totim

    def finalize_time_step(self):
        pass   # outputs are written inside do_step / solve

    def get_subcomponent_count(self) -> int:
        return 1

    def prepare_solve(self, component: int = 1):
        self._head_old = self._head

    def solve(self, component: int = 1) -> bool:
        """One full Picard solve of the current step's system; returns
        convergence (callers may re-invoke after set_value updates —
        the xmipy iterative-coupling pattern, mf6xmi.F90:220-340)."""
        kper, kstp, delt, pertim, totim = self._current
        iss = not self._sim.transient[kper - 1]
        pkgs = self._sim.period_packages(kper)
        head, info, aux = self._sim.solution.solve_timestep(
            self._head_old, delt, kstp=kstp, iss=iss, pkgs=pkgs)
        self._head = head
        self._solve_info = info
        return bool(info.converged)

    def finalize_solve(self, component: int = 1):
        self._totim = self._current[4]
