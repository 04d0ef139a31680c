"""Chemical-path-diagram (QPD) utilities — Edge/Group machinery of the
reference's Tools/Util/util.{H,cpp} (species/element/reaction indexing, the
Edge class representing atom transfer between species through reactions,
util.H:8-97) re-implemented on a runtime mechanism instead of a compiled-in
Fuego mechanism.

Edges: for a tracked element e, each reaction with reactant atoms a_i and
product atoms b_j transfers a_i*b_j/N atoms from species i to species j per
unit reaction rate (N = total e atoms through the reaction) — the standard
reaction-path splitting (util.cpp getEdges' HackSplitting mode).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .mechanism import atom_count


@dataclasses.dataclass
class Reaction:
    reactants: Dict[str, float]   # species -> stoich coeff
    products: Dict[str, float]
    reversible: bool = True
    label: str = ""

    def __repr__(self):
        lhs = " + ".join(f"{v:g} {k}" if v != 1 else k
                         for k, v in self.reactants.items())
        rhs = " + ".join(f"{v:g} {k}" if v != 1 else k
                         for k, v in self.products.items())
        arrow = "<=>" if self.reversible else "=>"
        return f"{lhs} {arrow} {rhs}"


def parse_reaction(line: str) -> Reaction:
    """Parse 'A + 2B <=> C + D' style reaction strings (third bodies (+M)
    and pressure-dependence markers are stripped)."""
    s = line.split("!")[0].strip()
    rev = "<=>" in s or ("=" in s and "=>" not in s)
    for arrow in ("<=>", "=>", "="):
        if arrow in s:
            lhs, rhs = s.split(arrow, 1)
            break
    else:
        raise ValueError(f"no arrow in reaction {line!r}")

    def side(txt):
        txt = re.sub(r"\(\+[^)]*\)", "", txt)
        out: Dict[str, float] = {}
        for term in txt.split("+"):
            term = term.strip()
            if not term or term.upper() == "M":
                continue
            m = re.match(r"^(\d+\.?\d*)\s*(.+)$", term)
            if m:
                coeff, name = float(m.group(1)), m.group(2).strip()
            else:
                coeff, name = 1.0, term
            out[name] = out.get(name, 0.0) + coeff
        return out

    return Reaction(side(lhs), side(rhs), rev, s)


class Edge:
    """Atom-transfer edge sp1 -> sp2 with a rate-weight list of
    (reaction index, atoms transferred per unit rate) (util.H:36-62)."""

    def __init__(self, sp1: str, sp2: str,
                 rwl: Optional[List[Tuple[int, float]]] = None):
        self.sp1 = sp1
        self.sp2 = sp2
        self.rwl: List[Tuple[int, float]] = list(rwl or [])

    def left(self) -> str:
        return self.sp1

    def right(self) -> str:
        return self.sp2

    def touches_sp(self, sp: str) -> bool:
        return sp in (self.sp1, self.sp2)

    def reverse(self) -> None:
        self.sp1, self.sp2 = self.sp2, self.sp1
        self.rwl = [(r, -w) for r, w in self.rwl]

    def equiv_sign(self, other: "Edge") -> int:
        """+1 same orientation, -1 reversed, 0 different edge (util.H:50)."""
        if (self.sp1, self.sp2) == (other.sp1, other.sp2):
            return 1
        if (self.sp1, self.sp2) == (other.sp2, other.sp1):
            return -1
        return 0

    def combine(self, other: "Edge", sgn: int) -> None:
        self.rwl.extend((r, sgn * w) for r, w in other.rwl)

    def key(self) -> Tuple[str, str]:
        return (self.sp1, self.sp2) if self.sp1 < self.sp2 \
            else (self.sp2, self.sp1)

    def __lt__(self, other: "Edge") -> bool:
        return (self.sp1, self.sp2) < (other.sp1, other.sp2)

    def __repr__(self):
        return f"Edge({self.sp1}->{self.sp2}, {self.rwl})"


class Group:
    """Element-count bag with the reference's Group ops (util.H:63-88)."""

    def __init__(self, elt_counts: Optional[Dict[str, int]] = None):
        self.counts = dict(elt_counts or {})

    def __sub__(self, other: "Group") -> "Group":
        out = dict(self.counts)
        for k, v in other.counts.items():
            out[k] = out.get(k, 0) - v
        return Group(out)

    def __mul__(self, n: int) -> "Group":
        return Group({k: v * n for k, v in self.counts.items()})

    def __getitem__(self, elem: str) -> int:
        return self.counts.get(elem, 0)

    def contains(self, elem: str) -> bool:
        return self.counts.get(elem, 0) != 0

    def same_sign(self) -> bool:
        vals = [v for v in self.counts.values() if v != 0]
        return all(v > 0 for v in vals) or all(v < 0 for v in vals)

    def size(self) -> int:
        return sum(abs(v) for v in self.counts.values())

    def awt(self) -> float:
        from .mechanism import ATOMIC_MASS
        return sum(ATOMIC_MASS[k.upper()] * v for k, v in
                   self.counts.items())


def get_edges(reactions: Sequence[Reaction], tr_elt: str) -> List[Edge]:
    """All atom-transfer edges for the tracked element, combined across
    reactions (getEdges, util.H:92-96)."""
    acc: Dict[Tuple[str, str], Edge] = {}
    for ir, rxn in enumerate(reactions):
        a = {s: c * atom_count(s, tr_elt)
             for s, c in rxn.reactants.items()
             if atom_count(s, tr_elt) > 0}
        b = {s: c * atom_count(s, tr_elt)
             for s, c in rxn.products.items()
             if atom_count(s, tr_elt) > 0}
        N = sum(b.values())
        if N <= 0:
            continue
        for si, ai in a.items():
            for sj, bj in b.items():
                if si == sj:
                    continue
                w = ai * bj / N
                e = Edge(si, sj, [(ir, w)])
                k = e.key()
                if k in acc:
                    sgn = acc[k].equiv_sign(e)
                    acc[k].combine(e, sgn)
                else:
                    acc[k] = e
    return sorted(acc.values())


def edge_fluxes(edges: Sequence[Edge],
                rates: np.ndarray) -> Dict[Tuple[str, str], float]:
    """Net atom flux per edge given per-reaction net rates
    (rates [n_reactions] — e.g. region-integrated from a plotfile's reaction
    rate components, the plotQPD evaluation)."""
    out = {}
    for e in edges:
        out[(e.sp1, e.sp2)] = float(sum(w * rates[r] for r, w in e.rwl))
    return out
