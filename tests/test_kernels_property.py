"""Property-based equivalence: pruned scorers == exhaustive scorer.

The seeded randomized tests (test_kernels.py) sample realistic segments;
these hypothesis properties hunt the ADVERSARIAL corner shapes instead —
single-doc postings, block_size 1, k past the match count, extreme
avgdl drift in both directions, all-tied scores, hostile bit-flag
combinations — and shrink any failure to a minimal counterexample. The
invariant under test is the engine's core lossless-pruning claim
(SURVEY.md §4): WAND and the conjunctive scorer must return bit-identical
ids and 1e-9-identical scores to the exhaustive evaluation for every
input, never just for likely ones.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from quicker_spark.functions.kernels import (
    encode_postings,
    score_segment_conjunctive,
    score_segment_exhaustive,
    score_segment_wand,
)
from quicker_spark.model import bm25_idf

N_DOCS = 40


@st.composite
def segments(draw):
    """(postings, decoded, idf, avgdl_query) for 1-4 terms over <=40 docs,
    encoded at a drifted avgdl and rebound to the query avgdl."""
    n_terms = draw(st.integers(1, 4))
    avgdl_query = draw(st.floats(5.0, 200.0))
    drift = draw(st.floats(0.4, 2.5))
    block_size = draw(st.sampled_from([1, 2, 4, 16]))
    tie_heavy = draw(st.booleans())
    postings, decoded, idf = {}, {}, {}
    for t in range(n_terms):
        term = f"content\x01t{t}"
        id_set = draw(st.sets(st.integers(0, N_DOCS - 1), min_size=1,
                              max_size=N_DOCS))
        ids = np.array(sorted(id_set), dtype=np.int64)
        df = len(ids)
        if tie_heavy:
            tfs = np.ones(df, dtype=np.int64)
            dls = np.full(df, 20, dtype=np.int64)
        else:
            tfs = np.array(draw(st.lists(st.integers(1, 9), min_size=df,
                                         max_size=df)), dtype=np.int64)
            dls = np.array(draw(st.lists(st.integers(1, 60), min_size=df,
                                         max_size=df)), dtype=np.int64)
        bits = np.array(draw(st.lists(st.integers(0, 3), min_size=df,
                                      max_size=df)), dtype=np.int64)
        postings[term] = encode_postings(
            ids, tfs, dls, bits, avgdl_query * drift,
            block_size=block_size).with_bounds(avgdl_query)
        decoded[term] = (ids, tfs, dls, bits)
        idf[term] = bm25_idf(N_DOCS, df)
    return postings, decoded, idf, avgdl_query


FLAGS = st.sampled_from([
    (0, 0, ()), (1, 0, ()), (0, 2, ()), (0, 0, (1, 2)), (1, 2, ()),
    (3, 0, ()), (0, 0, (3,)),
])


@settings(max_examples=60, deadline=None)
@given(seg=segments(), k=st.integers(1, 50), flags=FLAGS)
def test_wand_equals_exhaustive(seg, k, flags):
    postings, decoded, idf, avgdl = seg
    on, off, orf = flags
    query = {"should": [
        {"keyword": {"field": "content", "word": t.split("\x01")[1]}}
        for t in decoded]}
    e_ids, e_scores = score_segment_exhaustive(
        query, decoded, idf, avgdl, k, on=on, off=off, or_flags=orf)
    w_ids, w_scores = score_segment_wand(
        postings, idf, avgdl, k, on=on, off=off, or_flags=orf)
    np.testing.assert_array_equal(w_ids, e_ids)
    np.testing.assert_allclose(w_scores, e_scores, rtol=0, atol=1e-9)


@settings(max_examples=60, deadline=None)
@given(seg=segments(), k=st.integers(1, 50), flags=FLAGS)
def test_conjunctive_equals_exhaustive(seg, k, flags):
    postings, decoded, idf, avgdl = seg
    on, off, orf = flags
    query = {"must": [
        {"keyword": {"field": "content", "word": t.split("\x01")[1]}}
        for t in decoded]}
    e_ids, e_scores = score_segment_exhaustive(
        query, decoded, idf, avgdl, k, on=on, off=off, or_flags=orf)
    c_ids, c_scores = score_segment_conjunctive(
        postings, idf, avgdl, k, on=on, off=off, or_flags=orf)
    np.testing.assert_array_equal(c_ids, e_ids)
    np.testing.assert_allclose(c_scores, e_scores, rtol=0, atol=1e-9)
