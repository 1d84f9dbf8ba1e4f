"""Memory usage report (reference mem_write_usage,
src/Utilities/Memory/MemoryManager.f90:31 — the table printed at finalize).

The reference tracks every mem_allocate'd array by (name, path); here the
equivalent inventory is the model's array attributes and package pytrees,
summarized by component.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _nbytes(obj, seen):
    if obj is None or id(obj) in seen:
        return 0
    if hasattr(obj, "nbytes"):
        seen.add(id(obj))
        return int(obj.nbytes)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return sum(_nbytes(getattr(obj, f.name), seen)
                   for f in dataclasses.fields(obj))
    if isinstance(obj, (list, tuple)):
        return sum(_nbytes(x, seen) for x in obj)
    if isinstance(obj, dict):
        return sum(_nbytes(x, seen) for x in obj.values())
    return 0


def memory_report(model) -> str:
    """Per-component memory table for a model (MEMORY USAGE role)."""
    seen = set()
    rows = []
    for name in ("dtopo", "npf_arrays", "sto_arrays", "condsat3", "strt",
                 "ibound0", "chd", "wel", "rch", "drn", "riv", "ghb", "evt",
                 "xt3d", "mst_arrays", "dsp"):
        obj = getattr(model, name, None)
        nb = _nbytes(obj, seen)
        if nb:
            rows.append((name.upper(), nb))
    total = sum(nb for _, nb in rows)
    lines = ["", "MEMORY USAGE (model arrays)",
             f"{'COMPONENT':<16s} {'MBYTES':>12s}"]
    for name, nb in sorted(rows, key=lambda r: -r[1]):
        lines.append(f"{name:<16s} {nb / 1e6:12.4f}")
    lines.append(f"{'TOTAL':<16s} {total / 1e6:12.4f}")
    return "\n".join(lines)
