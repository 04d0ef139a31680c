"""Streamline-derived surface operations: alt-surface construction and the
per-line decorators (thermal thickness, cold-side strain, inclination angle).

Replaces the reference's per-line scan -> MPI_Gatherv -> IOProc descramble
pattern (/root/reference/Src/stream.cpp:1840-2074 build_surface_at_isoVal,
:1554-1840 add_thermal_thickness_to_surf, :1369-1553 add_cold_strain_to_surf,
:1211-1368 add_angle_to_surf) with vectorized crossing searches over the
resident [nlines, npts, nvars] array — no communication needed.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _crossings_from_mid(vals: np.ndarray, target: float):
    """For each line, the first station pair bracketing `target`, scanning
    outward from the midpoint (the reference scans from the seed at j=0).
    vals: [nl, npts].  Returns (jlo [nl], frac [nl], found [nl])."""
    nl, npts = vals.shape
    mid = (npts - 1) // 2
    # candidate segments ordered by distance from the midpoint
    below = (vals[:, :-1] - target) * (vals[:, 1:] - target) <= 0.0
    seg_idx = np.arange(npts - 1)
    dist = np.abs(seg_idx - mid)
    order = np.argsort(dist, kind="stable")
    found = np.zeros(nl, dtype=bool)
    jlo = np.zeros(nl, dtype=np.int64)
    for j in order:
        hit = below[:, j] & ~found
        jlo[hit] = j
        found |= hit
    a = vals[np.arange(nl), jlo]
    b = vals[np.arange(nl), jlo + 1]
    denom = np.where(np.abs(b - a) > 1e-300, b - a, 1.0)
    frac = np.clip((target - a) / denom, 0.0, 1.0)
    return jlo, frac, found


def _interp_at(lines: np.ndarray, jlo: np.ndarray, frac: np.ndarray
               ) -> np.ndarray:
    """Linear interp of all comps at station jlo+frac. [nl, nvars]."""
    nl = lines.shape[0]
    a = lines[np.arange(nl), jlo]
    b = lines[np.arange(nl), jlo + 1]
    return a + frac[:, None] * (b - a)


def build_surface_at_isoval(lines: np.ndarray, names, comp_name: str,
                            iso_val: float, with_distance: bool = False):
    """Point on each line where comp crosses iso_val (the alt-surface nodes,
    stream.cpp:1840-2074).  Returns (points [nl, nvars], found [nl]) — or
    (points, found, distance [nl]) with with_distance: the arclength from
    the seed station (j=0) to the crossing, the reference's
    ``distance_iso_to_alt`` surface variable (stream.cpp:1008,1636-1650)."""
    c = names.index(comp_name)
    jlo, frac, found = _crossings_from_mid(lines[:, :, c], iso_val)
    pts = _interp_at(lines, jlo, frac)
    if not with_distance:
        return pts, found
    s = arc_length(lines)
    nl = lines.shape[0]
    mid = (lines.shape[1] - 1) // 2
    s_cross = (s[np.arange(nl), jlo]
               + frac * (s[np.arange(nl), jlo + 1]
                         - s[np.arange(nl), jlo]))
    dist = np.where(found, np.abs(s_cross - s[:, mid]), 0.0)
    return pts, found, dist


def arc_length(lines: np.ndarray) -> np.ndarray:
    """Cumulative arclength along each line [nl, npts]."""
    seg = np.linalg.norm(np.diff(lines[:, :, :3], axis=1), axis=2)
    return np.concatenate([np.zeros((lines.shape[0], 1)),
                           np.cumsum(seg, axis=1)], axis=1)


def thermal_thickness(lines: np.ndarray, names, thick_comp: str,
                      lo_val: float, hi_val: float) -> np.ndarray:
    """Arclength between the loVal and hiVal crossings of thick_comp
    (add_thermal_thickness_to_surf, stream.cpp:1554-1840)."""
    c = names.index(thick_comp)
    s = arc_length(lines)
    jl, fl, okl = _crossings_from_mid(lines[:, :, c], lo_val)
    jh, fh, okh = _crossings_from_mid(lines[:, :, c], hi_val)
    nl = lines.shape[0]
    sl = s[np.arange(nl), jl] + fl * (s[np.arange(nl), jl + 1]
                                      - s[np.arange(nl), jl])
    sh = s[np.arange(nl), jh] + fh * (s[np.arange(nl), jh + 1]
                                      - s[np.arange(nl), jh])
    out = np.abs(sh - sl)
    out[~(okl & okh)] = 0.0
    return out


def cold_strain(lines: np.ndarray, names, strain_comp: str, t_comp: str,
                t_val: float) -> np.ndarray:
    """strain sampled where t_comp crosses t_val (add_cold_strain_to_surf,
    stream.cpp:1369-1553)."""
    ct = names.index(t_comp)
    cs = names.index(strain_comp)
    jlo, frac, found = _crossings_from_mid(lines[:, :, ct], t_val)
    vals = _interp_at(lines, jlo, frac)[:, cs]
    vals[~found] = 0.0
    return vals


def inclination_angle(lines: np.ndarray, up_dir: int = 1) -> np.ndarray:
    """Angle (deg) of the line through the two points bracketing the line
    midpoint vs the up axis (add_angle_to_surf, stream.cpp:1211-1368)."""
    mid = (lines.shape[1] - 1) // 2
    d = lines[:, mid + 1, :3] - lines[:, mid - 1, :3]
    n = np.linalg.norm(d, axis=1)
    cosang = np.abs(d[:, up_dir]) / np.maximum(n, 1e-300)
    return np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0)))


def advect_points(points: np.ndarray, names, dt: float) -> np.ndarray:
    """Advance surface points by u*dt (stream.cpp:1038-1103)."""
    vel_idx = [names.index(n) for n in
               ("x_velocity", "y_velocity", "z_velocity")]
    out = points.copy()
    out[:, :3] += dt * points[:, vel_idx]
    return out
