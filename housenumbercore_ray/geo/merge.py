"""Polyline segment merging — the ST_LineMerge analog.

The reference assembles a named street's geometry by repeatedly calling
PostGIS ``ST_LineMerge`` over its member way segments
(OSMStreet.setStreetGeometryFromSegments,
/root/reference/src/de/regioosm/housenumbercore/util/OSMStreet.java:139-190 —
with a >50-segment round-trip warning at :151-152). Here the merge is one
local graph walk: segments sharing endpoints chain into maximal polylines;
chains split at branching nodes (degree > 2); disjoint groups stay separate
(multi-linestring) — ST_LineMerge's contract.
"""

from __future__ import annotations

import numpy as np

__all__ = ["merge_segments"]


def _key(pt) -> tuple:
    return (round(float(pt[0]), 9), round(float(pt[1]), 9))


def merge_segments(segments) -> list[np.ndarray]:
    """segments: iterable of (n,2) coordinate arrays → merged polylines,
    deterministic order (chains sorted by smallest member segment index)."""
    segs = [np.asarray(s, dtype=np.float64) for s in segments]
    touch: dict[tuple, list] = {}
    for i, s in enumerate(segs):
        touch.setdefault(_key(s[0]), []).append((i, 0))
        touch.setdefault(_key(s[-1]), []).append((i, 1))

    used = [False] * len(segs)
    results: list[tuple[int, np.ndarray]] = []

    def walk(i: int, end: int):
        """Consume a chain starting with segment i oriented so that `end`
        (0=start,1=end) is the trailing side; returns (coords, min seg idx)."""
        used[i] = True
        coords = segs[i] if end == 1 else segs[i][::-1]
        parts = [coords]
        min_idx = i
        cur = _key(parts[-1][-1])
        while len(touch.get(cur, [])) == 2:       # simple pass-through node
            cand = [(j, e) for j, e in touch[cur] if not used[j]]
            if len(cand) != 1:
                break
            j, e = cand[0]
            used[j] = True
            min_idx = min(min_idx, j)
            piece = segs[j] if e == 0 else segs[j][::-1]
            parts.append(piece[1:])
            cur = _key(piece[-1])
        return np.vstack(parts), min_idx

    # two passes: chains anchored at non-pass-through endpoints first,
    # then leftover pure cycles
    for i in range(len(segs)):
        if used[i]:
            continue
        d0 = len(touch[_key(segs[i][0])])
        d1 = len(touch[_key(segs[i][-1])])
        if d0 != 2:
            coords, mi = walk(i, 1)
            results.append((mi, coords))
        elif d1 != 2:
            coords, mi = walk(i, 0)
            results.append((mi, coords))
    for i in range(len(segs)):                     # pure cycles
        if not used[i]:
            coords, mi = walk(i, 1)
            results.append((mi, coords))
    results.sort(key=lambda t: t[0])
    return [c for _, c in results]
