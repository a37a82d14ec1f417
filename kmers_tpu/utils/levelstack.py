"""Mergesort-style level-stack accumulator (shared by every streaming path).

Folding c chunk tables into one growing accumulator costs O(c^2 u)
bitonic-network work (each merge pads to the larger pow2 capacity); a
binary-counter stack of one table per size level merges equal sizes
pairwise and costs O(c u log c), with peak memory O(u log c) — up to
log2(c) live tables (u = distinct keys).  Any merge order produces the
identical final table (sorted-unique with summed counts), so results
stay bit-exact.

Used by the single-chip streaming counter (K <= 31 and multi-limb), the
sharded streaming pipeline, and :class:`kmers_tpu.pipelines.StreamingCounter`
— each supplies its own ``merge``/``slice`` pair over its table
representation.
"""

from __future__ import annotations

__all__ = ["LevelStack"]


class LevelStack:
    """``merge(a, b)`` combines two tables into a raw merged output;
    ``slice_(out)`` trims that output to its live capacity (typically a
    host fetch of the distinct count + a pow2 slice).  ``push`` adds a
    level-0 table, carrying equal-level merges up like binary-counter
    addition; ``fold`` collapses the remaining levels smallest-first.
    """

    def __init__(self, merge, slice_):
        self._merge = merge
        self._slice = slice_
        self._stack: list[tuple[int, object]] = []  # (level, table)

    def __len__(self) -> int:
        return len(self._stack)

    def push(self, tbl) -> None:
        level = 0
        while self._stack and self._stack[-1][0] == level:
            _, other = self._stack.pop()
            tbl = self._slice(self._merge(other, tbl))
            level += 1
        self._stack.append((level, tbl))

    def fold(self):
        """Collapse the stack (top = smallest first); None when empty."""
        if not self._stack:
            return None
        tbl = self._stack.pop()[1]
        while self._stack:
            tbl = self._slice(self._merge(self._stack.pop()[1], tbl))
        return tbl
