"""Checkpoint / resume of simulation state.

The reference has no restart files — its idiom is writing heads and
re-using them as the follow-on run's IC (SURVEY §5 "Checkpoint/resume").
Here state snapshots are first-class (the promised trivially-better
orbax-style design, realized with a plain npz so there is no extra
dependency): every device array needed to continue a run — heads,
concentrations, time counters — round-trips losslessly.
"""

from __future__ import annotations

import numpy as np


def save_checkpoint(path, head, *, kper=1, kstp=0, totim=0.0, conc=None,
                    extra=None):
    """Write a restart snapshot. ``extra``: dict name → array."""
    payload = dict(head=np.asarray(head),
                   kper=np.asarray(kper), kstp=np.asarray(kstp),
                   totim=np.asarray(totim))
    if conc is not None:
        payload["conc"] = np.asarray(conc)
    for k, v in (extra or {}).items():
        payload[f"x_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_checkpoint(path) -> dict:
    """Read a snapshot → dict(head, kper, kstp, totim[, conc], extra)."""
    z = np.load(path)
    out = dict(head=z["head"], kper=int(z["kper"]), kstp=int(z["kstp"]),
               totim=float(z["totim"]))
    if "conc" in z:
        out["conc"] = z["conc"]
    extra = {k[2:]: z[k] for k in z.files if k.startswith("x_")}
    if extra:
        out["extra"] = extra
    return out


def resume_simulation(sim, path):
    """Point a freshly-built Simulation at a checkpoint: the model restarts
    from the stored heads (and concentrations), like re-running with the
    saved .hds as IC/strt — but bit-exact."""
    import jax.numpy as jnp
    import dataclasses

    snap = load_checkpoint(path)
    sim.model.strt = jnp.asarray(snap["head"])
    if "conc" in snap and sim.gwt is not None:
        sim.conc = jnp.asarray(snap["conc"])
    return snap
