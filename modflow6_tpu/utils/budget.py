"""Volumetric budget accounting (per-step rates and cumulative volumes).

Behavioral parity target: the reference BudgetType volumetric tables with
IN/OUT columns and percent discrepancy
(src/Utilities/Budget.f90:83-142,178-311).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class BudgetTerm:
    name: str
    rate_in: float = 0.0
    rate_out: float = 0.0
    cum_in: float = 0.0
    cum_out: float = 0.0


class Budget:
    """Accumulates flow terms; rates are signed (positive = into the model)."""

    def __init__(self):
        self.terms: dict[str, BudgetTerm] = {}

    def add_entries(self, name, rates, delt):
        """rates: array of signed per-entry flows for this step."""
        t = self.terms.setdefault(name, BudgetTerm(name))
        rin = float(sum(r for r in rates if r > 0))
        rout = float(-sum(r for r in rates if r < 0))
        t.rate_in = rin
        t.rate_out = rout
        t.cum_in += rin * delt
        t.cum_out += rout * delt

    @property
    def total_in(self):
        return sum(t.rate_in for t in self.terms.values())

    @property
    def total_out(self):
        return sum(t.rate_out for t in self.terms.values())

    def percent_discrepancy(self) -> float:
        tin, tout = self.total_in, self.total_out
        denom = 0.5 * (tin + tout)
        if denom == 0.0:
            return 0.0
        return 100.0 * (tin - tout) / denom

    def table(self, title="VOLUME BUDGET") -> str:
        lines = [title, "-" * len(title)]
        lines.append(f"{'TERM':<16}{'RATE IN':>16}{'RATE OUT':>16}"
                     f"{'CUM IN':>16}{'CUM OUT':>16}")
        for t in self.terms.values():
            lines.append(f"{t.name:<16}{t.rate_in:>16.6e}{t.rate_out:>16.6e}"
                         f"{t.cum_in:>16.6e}{t.cum_out:>16.6e}")
        lines.append(f"{'TOTAL':<16}{self.total_in:>16.6e}{self.total_out:>16.6e}")
        lines.append(f"PERCENT DISCREPANCY: {self.percent_discrepancy():>10.4f}")
        return "\n".join(lines)
