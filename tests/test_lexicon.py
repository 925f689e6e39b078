"""Lexicon parity batteries — the reference's value_lexicon_test.cc,
sequence_lexicon_test.cc, and id_set_lexicon_test.cc fixtures run
verbatim against the Python kernels."""

import numpy as np
import pytest

from s2spark.kernels.lexicon import (EMPTY_SET_ID, IdSetLexicon,
                                     SequenceLexicon, ValueLexicon)

I64_MAX = 0x7FFFFFFFFFFFFFFF
I64_MIN = -0x8000000000000000
I32_MAX = (1 << 31) - 1


class TestValueLexicon:
    def test_duplicate_values(self):
        # value_lexicon_test.cc:35-53
        lex = ValueLexicon()
        assert lex.add(5) == 0
        assert lex.add(0) == 1
        assert lex.add(0) == 1
        assert lex.add(-3) == 2
        assert lex.add(5) == 0
        assert lex.add(0) == 1
        assert lex.add(I64_MAX) == 3
        assert lex.add(I64_MIN) == 4
        assert lex.add(I64_MAX) == 3
        assert lex.add(I64_MIN) == 4
        assert lex.size() == 5
        assert lex.value(0) == 5
        assert lex.value(1) == 0
        assert lex.value(2) == -3
        assert lex.value(3) == I64_MAX
        assert lex.value(4) == I64_MIN

    def test_clear(self):
        # value_lexicon_test.cc:55-64
        lex = ValueLexicon()
        assert lex.add(1) == 0
        assert lex.add(2) == 1
        assert lex.add(1) == 0
        lex.clear()
        assert lex.add(2) == 0
        assert lex.add(1) == 1
        assert lex.add(2) == 0

    def test_float_equality(self):
        # value_lexicon_test.cc:66-79: points differing only in the
        # sign of a zero coordinate are EQUAL (operator== semantics),
        # even though their byte patterns differ
        lex = ValueLexicon(key=lambda p: tuple(p))
        a = np.array([1.0, 0.0, 0.0])
        b = np.array([1.0, -0.0, 0.0])
        c = np.array([1.0, 0.0, -0.0])
        assert a.tobytes() != b.tobytes()
        assert a.tobytes() != c.tobytes()
        assert b.tobytes() != c.tobytes()
        assert lex.add(a) == 0
        assert lex.add(b) == 0
        assert lex.add(c) == 0
        assert lex.size() == 1
        # first-seen value is the stored representative
        assert lex.value(0).tobytes() == a.tobytes()


class TestSequenceLexicon:
    def test_int64(self):
        # sequence_lexicon_test.cc:43-60
        lex = SequenceLexicon()
        assert lex.add([]) == 0
        assert lex.add([5]) == 1
        assert lex.add([]) == 0
        assert lex.add([5, 5]) == 2
        assert lex.add([5, 0, -3]) == 3
        assert lex.add([5]) == 1
        assert lex.add([I64_MAX]) == 4
        assert lex.add([5, 0, -3]) == 3
        assert lex.add([]) == 0
        assert lex.size() == 5
        assert lex.sequence(0) == ()
        assert lex.sequence(1) == (5,)
        assert lex.sequence(2) == (5, 5)
        assert lex.sequence(3) == (5, 0, -3)
        assert lex.sequence(4) == (I64_MAX,)

    def test_clear(self):
        # sequence_lexicon_test.cc:62-69
        lex = SequenceLexicon()
        assert lex.add([1]) == 0
        assert lex.add([2]) == 1
        lex.clear()
        assert lex.add([2]) == 0
        assert lex.add([1]) == 1


class TestIdSetLexicon:
    def test_empty_set(self):
        # id_set_lexicon_test.cc:40-43
        lex = IdSetLexicon()
        assert lex.id_set(lex.add([])) == ()
        assert IdSetLexicon.empty_set_id() == EMPTY_SET_ID

    def test_singleton_sets(self):
        # id_set_lexicon_test.cc:45-57: singletons are their element
        lex = IdSetLexicon()
        assert lex.add([5]) == 5
        assert lex.add([0, 0]) == 0
        assert lex.add_singleton(1) == 1
        assert lex.add([I32_MAX]) == I32_MAX
        assert lex.id_set(0) == (0,)
        assert lex.id_set(1) == (1,)
        assert lex.id_set(5) == (5,)
        assert lex.id_set(I32_MAX) == (I32_MAX,)

    def test_sets_are_sorted(self):
        # id_set_lexicon_test.cc:59-68
        lex = IdSetLexicon()
        assert lex.add([2, 5]) == ~0
        assert lex.add([3, 2, 5]) == ~1
        assert lex.add([5, 2]) == ~0
        assert lex.add([5, 3, 2, 5]) == ~1
        assert lex.id_set(~0) == (2, 5)
        assert lex.id_set(~1) == (2, 3, 5)

    def test_clear(self):
        # id_set_lexicon_test.cc:70-78
        lex = IdSetLexicon()
        assert lex.add([1, 2]) == ~0
        assert lex.add([3, 4]) == ~1
        lex.clear()
        assert lex.add([3, 4]) == ~0
        assert lex.add([1, 2]) == ~1

    def test_dedup_to_singleton(self):
        # id_set_lexicon.cc:84-86: duplicates removed BEFORE the
        # singleton check, so {7,7,7} is the singleton 7
        lex = IdSetLexicon()
        assert lex.add([7, 7, 7]) == 7

    def test_rejects_negative(self):
        lex = IdSetLexicon()
        with pytest.raises(ValueError):
            lex.add([-1])
        with pytest.raises(ValueError):
            lex.add_singleton(1 << 31)
