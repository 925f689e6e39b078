"""Lexicons — compact dictionary encoders for values, sequences, and
integer sets (reference value_lexicon.h:45-95, sequence_lexicon.h:
36-105, id_set_lexicon.h:26-152).

The reference uses these to attach label sets to S2Builder edges:
``ValueLexicon`` deduplicates arbitrary values into dense uint32 ids,
``SequenceLexicon`` deduplicates whole sequences, and ``IdSetLexicon``
canonicalizes integer SETS (sorted, deduped) with two space
optimizations taken verbatim from id_set_lexicon.cc:57-96:

  * the empty set is the sentinel ``EMPTY_SET_ID`` (int32 min),
  * singleton sets are represented by their own element (>= 0),
  * every other set is the bitwise complement ``~seq_id`` of its
    SequenceLexicon id — so non-negative ids never collide with
    multi-element set ids.

These are driver-side kernels (used when assembling builder layers and
label joins).  The distributed analogue of a lexicon is plain Spark
dictionary encoding — ``F.dense_rank`` over a sorted distinct frame,
or a broadcast join against a `(value, id)` dim table — which is what
the ops layer uses when label sets live in a DataFrame column; these
classes exist for kernel-side parity with the reference's builder
machinery and for bit-identical fixture tests.
"""

from __future__ import annotations

__all__ = ["ValueLexicon", "SequenceLexicon", "IdSetLexicon",
           "EMPTY_SET_ID"]

EMPTY_SET_ID = -(1 << 31)  # id_set_lexicon.h:140 kEmptySetId


class ValueLexicon:
    """Duplicate-eliminating value → dense id map (value_lexicon.h:
    45-95).  Ids are assigned sequentially from 0 in first-seen order.

    ``key`` optionally maps a value to its hash/equality identity
    (the reference's Hasher/KeyEqual template params) — e.g. a NumPy
    point becomes ``tuple(p)`` so that +0.0 and -0.0 coincide exactly
    as operator== does in the reference's FloatEquality test."""

    def __init__(self, key=None):
        self._key = key
        self._ids: dict = {}
        self._values: list = []

    def add(self, value) -> int:
        k = self._key(value) if self._key else value
        got = self._ids.get(k)
        if got is not None:
            return got
        vid = len(self._values)
        self._ids[k] = vid
        self._values.append(value)
        return vid

    def value(self, vid: int):
        return self._values[vid]

    def size(self) -> int:
        return len(self._values)

    def clear(self) -> None:
        self._ids.clear()
        self._values.clear()


class SequenceLexicon:
    """Duplicate-eliminating sequence → dense id map
    (sequence_lexicon.h:36-105): sequences keep their ORDER and
    multiplicity; only whole-sequence duplicates collapse."""

    def __init__(self):
        self._ids: dict = {}
        self._sequences: list = []

    def add(self, seq) -> int:
        k = tuple(seq)
        got = self._ids.get(k)
        if got is not None:
            return got
        sid = len(self._sequences)
        self._ids[k] = sid
        self._sequences.append(k)
        return sid

    def sequence(self, sid: int) -> tuple:
        return self._sequences[sid]

    def size(self) -> int:
        return len(self._sequences)

    def clear(self) -> None:
        self._ids.clear()
        self._sequences.clear()


class IdSetLexicon:
    """Canonicalized integer-set → id map (id_set_lexicon.h:26-152,
    id_set_lexicon.cc:57-96).  Values must be non-negative int32."""

    def __init__(self):
        self._id_sets = SequenceLexicon()

    def add(self, ids) -> int:
        ids = list(ids)
        for v in ids:
            if not (0 <= v < (1 << 31)):
                raise ValueError(
                    "IdSetLexicon values must be non-negative int32")
        if not ids:
            return EMPTY_SET_ID
        ids = sorted(set(ids))
        if len(ids) == 1:
            return ids[0]
        return ~self._id_sets.add(ids)

    @staticmethod
    def add_singleton(vid: int) -> int:
        # singleton sets use no space (id_set_lexicon.h:108-112)
        if not (0 <= vid < (1 << 31)):
            raise ValueError(
                "IdSetLexicon values must be non-negative int32")
        return vid

    @staticmethod
    def empty_set_id() -> int:
        return EMPTY_SET_ID

    def id_set(self, set_id: int) -> tuple:
        if set_id >= 0:
            return (set_id,)
        if set_id == EMPTY_SET_ID:
            return ()
        return self._id_sets.sequence(~set_id)

    def clear(self) -> None:
        self._id_sets.clear()
