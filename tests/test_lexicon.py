"""Sequence/ID-set lexicons vs the reference's semantics
(s2/lexicon.go:27-175, s2/lexicon_test.go)."""

from geo_ray.state.lexicon import EMPTY_SET_ID, IdSetLexicon, SequenceLexicon


def test_sequence_lexicon_dedup_and_order():
    lex = SequenceLexicon()
    assert lex.add([1, 2, 3]) == 0
    assert lex.add([4, 5]) == 1
    assert lex.add([1, 2, 3]) == 0  # duplicate sequence -> same id
    assert lex.add([]) == 2
    assert lex.add([1, 2]) == 3     # prefix is a distinct sequence
    assert lex.sequence(0) == [1, 2, 3]
    assert lex.sequence(1) == [4, 5]
    assert lex.sequence(2) == []
    assert lex.sequence(3) == [1, 2]
    assert lex.size() == 4
    lex.clear()
    assert lex.size() == 0
    assert lex.add([7]) == 0


def test_idset_lexicon_implicit_representations():
    lex = IdSetLexicon()
    assert lex.add() == EMPTY_SET_ID
    assert lex.id_set(EMPTY_SET_ID) == []
    # singletons are their own id (no storage)
    assert lex.add(5) == 5
    assert lex.id_set(5) == [5]
    # duplicates collapse to a singleton
    assert lex.add(9, 9, 9) == 9
    # multi-element sets: canonicalized, complement-coded, deduplicated
    a = lex.add(3, 1, 2)
    b = lex.add(2, 3, 1, 1)
    assert a == b < 0
    assert lex.id_set(a) == [1, 2, 3]
    c = lex.add(10, 11)
    assert c != a and lex.id_set(c) == [10, 11]


def test_idset_lexicon_rejects_negative():
    import pytest
    lex = IdSetLexicon()
    with pytest.raises(ValueError):
        lex.add(-1)
    with pytest.raises(ValueError):
        lex.add(-2, 4)
