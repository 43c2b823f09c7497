"""Sequence and ID-set lexicons.

Semantics of reference s2/lexicon.go:27-175: compact interning of
integer sequences and sets.  A ``SequenceLexicon`` maps each distinct
sequence to a sequential 32-bit id; an ``IdSetLexicon`` additionally
represents empty and singleton sets implicitly (the empty set gets a
reserved sentinel, a singleton is its own element, and multi-element
sets are canonicalized — sorted, deduplicated — and stored as the
bitwise complement of their sequence id).

One deliberate divergence: the reference keys its dedup map by an
adler32 hash of the sequence WITHOUT verifying equality on hit, so a
hash collision silently returns the wrong id
(s2/lexicon.go:129-140, 152-160).  This port interns by the sequence
value itself, which is collision-proof; ids are assigned in the same
order, so collision-free workloads see identical ids.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

EMPTY_SET_ID = -(1 << 31)  # s2/lexicon.go:29


class SequenceLexicon:
    """s2/lexicon.go:101-168."""

    def __init__(self):
        self.values: List[int] = []
        self.begins: List[int] = [0]
        self._ids: Dict[Tuple[int, ...], int] = {}

    def add(self, ids: Sequence[int]) -> int:
        key = tuple(int(v) for v in ids)
        got = self._ids.get(key)
        if got is not None:
            return got
        self.values.extend(key)
        self.begins.append(len(self.values))
        new_id = len(self.begins) - 2
        self._ids[key] = new_id
        return new_id

    def sequence(self, seq_id: int) -> List[int]:
        return self.values[self.begins[seq_id]:self.begins[seq_id + 1]]

    def size(self) -> int:
        return len(self.begins) - 1

    def clear(self) -> None:
        self.values = []
        self.begins = [0]
        self._ids = {}


class IdSetLexicon:
    """s2/lexicon.go:41-97."""

    def __init__(self):
        self._sets = SequenceLexicon()

    def add(self, *ids: int) -> int:
        if len(ids) == 0:
            return EMPTY_SET_ID
        if len(ids) == 1:
            if ids[0] < 0:
                raise ValueError("ids must be non-negative")
            return int(ids[0])
        canon = sorted(set(int(v) for v in ids))
        if canon[0] < 0:
            raise ValueError("ids must be non-negative")
        if len(canon) == 1:  # duplicates collapsed to a singleton
            return canon[0]
        return ~self._sets.add(canon)

    def id_set(self, set_id: int) -> List[int]:
        if set_id >= 0:
            return [set_id]
        if set_id == EMPTY_SET_ID:
            return []
        return list(self._sets.sequence(~set_id))

    def clear(self) -> None:
        self._sets.clear()
