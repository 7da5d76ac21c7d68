"""Year-interval doc partitioning (reference: ``Partition.build``,
``common/.../terms/Partition.java:214-260`` — SURVEY.md §2.5).

Docs are bucketed into byte-sized part ids by year: the focus interval
``[start, end]`` is one part; the non-focus range is cut into calendar
periods of ``period`` years; thin periods (fewer than ``min_docs``
docs) merge with their neighbor toward the focus, never across it.
"""

from __future__ import annotations

import numpy as np


def year_parts(
    years: np.ndarray,
    focus_start: int,
    focus_end: int,
    period: int = 10,
    min_docs: int = 1,
):
    """→ (part_id per doc int16, part list [(lo, hi, is_focus)]).

    Deterministic pure function of the year vector (docs with year
    outside every part get part -1).
    """
    years = np.asarray(years)
    present = years[(years >= 0)]
    if present.size == 0:
        return np.full(len(years), -1, np.int16), []
    lo_all = int(present.min())
    hi_all = int(present.max())

    def cut(lo: int, hi: int) -> list[tuple[int, int]]:
        """Calendar periods of `period` years covering [lo, hi]."""
        if lo > hi:
            return []
        first = (lo // period) * period
        bounds = []
        s = first
        while s <= hi:
            bounds.append((max(s, lo), min(s + period - 1, hi)))
            s += period
        return bounds

    def count(p) -> int:
        return int(((years >= p[0]) & (years <= p[1])).sum())

    def merge_thin_toward(parts, focus_after: bool):
        """Thin parts merge with their neighbor toward the focus;
        never across it.  ``focus_after``: the focus lies after this
        range (so merging toward = merging with the NEXT part)."""
        if focus_after:
            out: list[tuple[int, int]] = []
            for p in reversed(parts):  # walk from focus outward
                if out and count(p) < min_docs:
                    nxt = out.pop()
                    out.append((min(p[0], nxt[0]), max(p[1], nxt[1])))
                else:
                    out.append(p)
            out.reverse()
            # outermost may still be thin: absorb into its inner neighbor
            if len(out) >= 2 and count(out[0]) < min_docs:
                out = [(min(out[0][0], out[1][0]), max(out[0][1], out[1][1]))] + out[2:]
            return out
        out = []
        for p in parts:  # focus is before: walk from focus outward
            if out and count(p) < min_docs:
                prv = out.pop()
                out.append((min(prv[0], p[0]), max(prv[1], p[1])))
            else:
                out.append(p)
        if len(out) >= 2 and count(out[-1]) < min_docs:
            out = out[:-2] + [(min(out[-2][0], out[-1][0]), max(out[-2][1], out[-1][1]))]
        return out

    before = merge_thin_toward(cut(lo_all, focus_start - 1), focus_after=True)
    after = merge_thin_toward(cut(focus_end + 1, hi_all), focus_after=False)
    parts = [(p[0], p[1], False) for p in before]
    parts.append((focus_start, focus_end, True))
    parts.extend((p[0], p[1], False) for p in after)

    ids = np.full(len(years), -1, np.int16)
    for pid, (lo, hi, _) in enumerate(parts):
        ids[(years >= lo) & (years <= hi)] = pid
    return ids, parts
