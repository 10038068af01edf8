"""Combinator semantics ported from the reference's
gen/test/term_query_test.go:11-36 (Empty pruning, nested rendering)."""

from quicker_spark.plans.term_query import And, Empty, NewTermQuery, Or, TermQuery


def test_empty_word_is_empty_query():
    assert NewTermQuery("content", "").empty()
    assert Empty().empty()


def test_and_or_prune_empty_children():
    a = NewTermQuery("content", "a")
    b = NewTermQuery("content", "b")
    assert And(a, Empty()).keyword == a.keyword  # single survivor collapses
    assert Or(Empty(), Empty()).empty()
    q = And(a, Or(b, Empty()))
    assert str(q) == "(content\\a&&content\\b)"


def test_nested_to_string():
    q1, q2, q3 = (NewTermQuery("c", w) for w in ("x", "y", "z"))
    q = Or(And(q1, q2), q3)
    assert str(q) == "((c\\x&&c\\y)||c\\z)"


def test_json_roundtrip():
    q = Or(And(NewTermQuery("content", "def"), NewTermQuery("content", "x")),
           NewTermQuery("repo", "org1"))
    q2 = TermQuery.from_json(q.to_json())
    assert str(q2) == str(q)
    assert q2.terms() == q.terms()


def test_terms_collects_leaves():
    q = And(NewTermQuery("content", "a"), Or(NewTermQuery("content", "b"),
                                             NewTermQuery("content", "c")))
    assert q.terms() == {"content\x01a", "content\x01b", "content\x01c"}
