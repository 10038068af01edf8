"""Numpy posting-list kernels (no Spark imports — unit-testable).

These run on executors inside Arrow UDFs. The posting layout recreates the
reference's denormalized posting value — each entry carries its doc's
BitsFeature next to the id (reference:
internal/reverse_index/skiplist_reverse_index.go:22-25 ``SkipListValue{Id,
BitsFeature}``) — extended with tf and doc_len so BM25 is computable from
the posting run alone, with no segment-sidecar join at query time (at
10^12-doc scale a per-query join against per-segment doc tables would
shuffle far more than the postings themselves).

Layout per (segment, term): postings are split into blocks of
``block_size`` entries. Each of the four aligned streams (doc_ids, tfs,
doc_lens, bits) is varbyte-encoded per block; doc_ids are delta-encoded
with the delta chain RESTARTING at each block (first id of a block is
absolute) so any block decodes independently — that's what lets block-max
WAND skip blocks without touching their bytes. Per-block metadata: last
doc_id (skip pointer) + max tf + min doc_len + byte offsets into each
stream.

The WAND bound is derived at QUERY time from immutable per-block stats —
segments are avgdl-independent, so a delete/upsert that shifts avgdl
never rewrites untouched waves. Two bound sources, elementwise min:

1. ``u(max_tf, min_dl, avgdl)`` — always admissible (u is monotone in tf,
   anti-monotone in dl) but LOOSE: on hot terms it over-estimates enough
   to collapse WAND pruning (measured 7x slower than exhaustive TAAT).
2. ``u_ref * max_corner_ratio`` — ``u_ref`` is the TIGHT per-block max u
   computed at the wave's build-time ``avgdl_ref``; the drift correction
   ``ratio(tf, dl) = D(tf, dl, avgdl_ref) / D(tf, dl, avgdl)`` (where
   ``u = tf(k1+1)/D``) is monotone in each argument, so its maximum over
   the block lies at a corner of [min_tf, max_tf] x [min_dl, max_dl] —
   all four corner stats are immutable.

When avgdl == avgdl_ref (any index untouched by maintenance) the bound
is exactly u_ref — identical pruning to storing the bound itself.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from quicker_spark.functions.codec import (
    delta_encode,
    varbyte_decode,
    varbyte_encode_with_counts,
)
from quicker_spark.model import B, K1

DEFAULT_BLOCK = 128


def bm25_u(tf: np.ndarray, dl: np.ndarray, avgdl: float,
           k1: float = K1, b: float = B) -> np.ndarray:
    """Per-posting tf/length component; score = idf * u. Fixed float64
    expression order (rank-identity across partitionings/engines)."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


@dataclass
class EncodedPostings:
    """One (segment, term) posting run in its stored form."""

    df: int
    ids: bytes
    tfs: bytes
    dls: bytes
    bits: bytes
    block_last: np.ndarray    # int64[n_blocks]
    block_max_tf: np.ndarray  # int64[n_blocks], immutable bound inputs
    block_min_dl: np.ndarray
    block_min_tf: np.ndarray
    block_max_dl: np.ndarray
    block_max_u_ref: np.ndarray  # float64[n_blocks], tight max u AT avgdl_ref
    off_ids: np.ndarray       # int32[n_blocks+1] byte offsets (end sentinel)
    off_tfs: np.ndarray
    off_dls: np.ndarray
    off_bits: np.ndarray
    avgdl_ref: float = 0.0    # corpus avgdl when this run was encoded
    block_size: int = DEFAULT_BLOCK
    # derived at query time by with_bounds() — never persisted
    block_max_u: np.ndarray | None = None

    def with_bounds(self, avgdl: float, k1: float = K1, b: float = B):
        """Derive the admissible per-block WAND upper bound for the
        CURRENT avgdl (see module docstring for the two-source min and
        the corner-monotonicity argument). Exactly ``u_ref`` when avgdl
        hasn't drifted; under drift, the (1 + 1e-12) bump absorbs the
        few-ulp float gap between this evaluation and score_at's."""
        if not self.df:
            self.block_max_u = np.zeros(0, dtype=np.float64)
            return self
        if avgdl == self.avgdl_ref:
            self.block_max_u = self.block_max_u_ref
            return self
        loose = bm25_u(self.block_max_tf.astype(np.float64),
                       self.block_min_dl.astype(np.float64), avgdl, k1, b)
        # ratio(tf, dl) = D(avgdl_ref) / D(avgdl) with D = tf + c + e*dl;
        # monotone in tf and in dl -> max over the block is at a corner
        c = k1 * (1.0 - b)
        e0 = k1 * b / self.avgdl_ref
        e1 = k1 * b / avgdl
        rmax = None
        for tf in (self.block_min_tf, self.block_max_tf):
            tf = tf.astype(np.float64)
            for dl in (self.block_min_dl, self.block_max_dl):
                dl = dl.astype(np.float64)
                r = (tf + c + e0 * dl) / (tf + c + e1 * dl)
                rmax = r if rmax is None else np.maximum(rmax, r)
        drift = self.block_max_u_ref * rmax
        self.block_max_u = np.minimum(loose, drift) * (1.0 + 1e-12)
        return self

    @property
    def n_blocks(self) -> int:
        return len(self.block_last)

    def block_n(self, blk: int) -> int:
        if blk < self.n_blocks - 1:
            return self.block_size
        return self.df - blk * self.block_size

    def decode_block_ids(self, blk: int) -> np.ndarray:
        """Ascending doc_ids of one block (decodes only the id stream)."""
        d = varbyte_decode(self.ids[self.off_ids[blk]:self.off_ids[blk + 1]])
        return np.cumsum(d, dtype=np.uint64).astype(np.int64)

    def decode_block_vals(self, blk: int):
        """-> (tfs, dls, bits) of one block."""
        tfs = varbyte_decode(self.tfs[self.off_tfs[blk]:self.off_tfs[blk + 1]]).astype(np.int64)
        dls = varbyte_decode(self.dls[self.off_dls[blk]:self.off_dls[blk + 1]]).astype(np.int64)
        bts = varbyte_decode(self.bits[self.off_bits[blk]:self.off_bits[blk + 1]]).astype(np.int64)
        return tfs, dls, bts

    def decode_block(self, blk: int):
        """-> (ids, tfs, dls, bits) numpy arrays for one block."""
        return (self.decode_block_ids(blk), *self.decode_block_vals(blk))

    def decode_all(self):
        """Vectorized full decode -> (ids, tfs, dls, bits)."""
        deltas = varbyte_decode(self.ids)
        c = np.cumsum(deltas, dtype=np.uint64)
        n = self.df
        starts = np.arange(0, n, self.block_size)
        # within a block: abs[j] = c[j] - (c[start] - delta[start])
        corr = c[starts] - deltas[starts]
        ids = (c - np.repeat(corr, np.diff(np.append(starts, n)))).astype(np.int64)
        tfs = varbyte_decode(self.tfs).astype(np.int64)
        dls = varbyte_decode(self.dls).astype(np.int64)
        bts = varbyte_decode(self.bits).astype(np.int64)
        return ids, tfs, dls, bts


def encode_postings(ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                    bits: np.ndarray, avgdl_ref: float,
                    k1: float = K1, b: float = B,
                    block_size: int = DEFAULT_BLOCK) -> EncodedPostings:
    """Encode one (segment, term) run. ``ids`` must be strictly ascending.

    Fully vectorized: each of the four streams is ONE varbyte pass over
    the whole run (per-block python calls made a hot 20k-posting term cost
    ~640 tiny encode calls and dominated the build). Block offsets come
    from the per-value byte counts; the id delta chain restarts at block
    starts by patching those positions back to absolute values.

    ``avgdl_ref`` seeds the tight reference bound; the encoded bytes stay
    valid (just gradually less tightly bounded) as corpus stats drift.
    """
    n = len(ids)
    if n == 0:
        z = np.zeros(1, dtype=np.int32)
        zi = np.zeros(0, dtype=np.int64)
        return EncodedPostings(
            df=0, ids=b"", tfs=b"", dls=b"", bits=b"",
            block_last=zi, block_max_tf=zi, block_min_dl=zi,
            block_min_tf=zi, block_max_dl=zi,
            block_max_u_ref=np.zeros(0, dtype=np.float64),
            off_ids=z, off_tfs=z, off_dls=z, off_bits=z,
            avgdl_ref=avgdl_ref, block_size=block_size,
        )
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    starts = np.arange(0, n, block_size)
    n_blocks = len(starts)
    ends = np.append(starts[1:], n)

    ids_u = ids.astype(np.uint64)
    deltas = delta_encode(ids_u)
    deltas[starts] = ids_u[starts]  # block-independent decode

    def stream(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
        buf, nb = varbyte_encode_with_counts(np.asarray(vals, dtype=np.uint64))
        cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(nb, out=cum[1:])
        return buf, cum[np.append(starts, n)].astype(np.int32)

    id_buf, off_ids = stream(deltas)
    tf_buf, off_tfs = stream(tfs)
    dl_buf, off_dls = stream(dls)
    bit_buf, off_bits = stream(bits)

    block_last = ids[ends - 1]
    tfs_i = np.asarray(tfs, dtype=np.int64)
    dls_i = np.asarray(dls, dtype=np.int64)
    u = bm25_u(tfs_i, dls_i, avgdl_ref, k1, b)
    return EncodedPostings(
        df=n, ids=id_buf, tfs=tf_buf, dls=dl_buf, bits=bit_buf,
        block_last=block_last,
        block_max_tf=np.maximum.reduceat(tfs_i, starts),
        block_min_dl=np.minimum.reduceat(dls_i, starts),
        block_min_tf=np.minimum.reduceat(tfs_i, starts),
        block_max_dl=np.maximum.reduceat(dls_i, starts),
        # nextafter-up: tight AND admissible at avgdl_ref
        block_max_u_ref=np.nextafter(np.maximum.reduceat(u, starts), np.inf),
        off_ids=off_ids, off_tfs=off_tfs, off_dls=off_dls, off_bits=off_bits,
        avgdl_ref=avgdl_ref, block_size=block_size,
    )


def encode_postings_batch(ids_col, tfs_col, dls_col, bits_col,
                          avgdl_ref: float, k1: float = K1, b: float = B,
                          block_size: int = DEFAULT_BLOCK) -> list[tuple]:
    """Encode a whole Arrow batch of posting runs with O(1) numpy passes.

    Same layout as :func:`encode_postings` row by row (tested identical),
    but all four streams of ALL rows are varbyte-encoded in one call each:
    per-row numpy dispatch made the encoder the build's bottleneck once
    tokenization was vectorized (most terms are tiny runs — 30 numpy calls
    of ~3 elements per row is pure overhead).

    Returns one tuple per row matching POSTINGS_SCHEMA field order.
    """
    nrows = len(ids_col)
    if nrows == 0:
        return []
    lens = np.fromiter((len(x) for x in ids_col), dtype=np.int64, count=nrows)
    total = int(lens.sum())
    row_starts = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(lens, out=row_starts[1:])
    ids = np.concatenate([np.asarray(x, dtype=np.int64) for x in ids_col])
    tfs = np.concatenate([np.asarray(x, dtype=np.int64) for x in tfs_col])
    dls = np.concatenate([np.asarray(x, dtype=np.int64) for x in dls_col])
    bts = np.concatenate([np.asarray(x, dtype=np.int64) for x in bits_col])

    row_idx = np.repeat(np.arange(nrows), lens)
    # sort each run by doc_id here (one C lexsort per batch) — JVM-side
    # sort_array over millions of 4-field structs was pure GC pressure
    # (measured 500s+ of GC in the merge stage at 600k docs)
    order = np.lexsort((ids, row_idx))
    if not np.array_equal(order, np.arange(total)):
        ids, tfs, dls, bts = ids[order], tfs[order], dls[order], bts[order]
    rel = np.arange(total, dtype=np.int64) - row_starts[row_idx]
    is_start = (rel % block_size) == 0
    # delta chain restarting at every block start (row starts included)
    prev = np.empty(total, dtype=np.int64)
    prev[0] = 0
    prev[1:] = ids[:-1]
    deltas = np.where(is_start, ids, ids - prev).astype(np.uint64)

    bstart_idx = np.nonzero(is_start)[0]
    # block index ranges per row
    n_blocks_row = ((lens + block_size - 1) // block_size).astype(np.int64)
    brow_starts = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(n_blocks_row, out=brow_starts[1:])
    # block end positions: next block start (or row end)
    bend_idx = np.empty(len(bstart_idx), dtype=np.int64)
    bend_idx[:-1] = bstart_idx[1:]
    bend_idx[-1] = total
    # rows' last blocks end at the row end, not the next row's first block
    bend_idx[brow_starts[1:] - 1] = row_starts[1:]
    block_last_all = ids[bend_idx - 1]
    block_max_tf_all = np.maximum.reduceat(tfs, bstart_idx)
    block_min_dl_all = np.minimum.reduceat(dls, bstart_idx)
    block_min_tf_all = np.minimum.reduceat(tfs, bstart_idx)
    block_max_dl_all = np.maximum.reduceat(dls, bstart_idx)
    u = bm25_u(tfs, dls, avgdl_ref, k1, b)
    block_u_ref_all = np.nextafter(np.maximum.reduceat(u, bstart_idx), np.inf)

    streams = []
    for vals in (deltas, tfs.astype(np.uint64), dls.astype(np.uint64),
                 bts.astype(np.uint64)):
        buf, nb = varbyte_encode_with_counts(vals)
        cum = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(nb, out=cum[1:])
        streams.append((buf, cum))

    out = []
    for r in range(nrows):
        s, e = row_starts[r], row_starts[r + 1]
        bs, be = brow_starts[r], brow_starts[r + 1]
        blk_bounds = np.append(bstart_idx[bs:be], e)
        row = [int(lens[r])]
        for buf, cum in streams:
            row.append(buf[cum[s]:cum[e]])
        row.append(block_last_all[bs:be].tolist())
        row.append(block_max_tf_all[bs:be].tolist())
        row.append(block_min_dl_all[bs:be].tolist())
        row.append(block_min_tf_all[bs:be].tolist())
        row.append(block_max_dl_all[bs:be].tolist())
        row.append(block_u_ref_all[bs:be].tolist())
        for _, cum in streams:
            row.append((cum[blk_bounds] - cum[s]).astype(np.int32).tolist())
        out.append(tuple(row))
    return out


# -- vectorized predicates / set ops -----------------------------------------

def filter_by_bits_vec(bits: np.ndarray, on: int = 0, off: int = 0,
                       or_flags=()) -> np.ndarray:
    """Vectorized reference bit predicate (skiplist_reverse_index.go:158-171).
    Zero-valued orFlags are skipped, matching the reference's ``orFlag > 0``
    guard — passing 0 must be a no-op, not an always-false filter."""
    m = (bits & on) == on
    m &= (bits & off) == 0
    for f in or_flags:
        if f > 0:
            m &= (bits & f) != 0
    return m


def intersect_many(arrays: list[np.ndarray]) -> np.ndarray:
    """k-way intersection of ascending int64 arrays — same contract as the
    reference's IntersectionOfSkipList (0 lists -> empty, 1 -> itself,
    early-exit on empty; skiplist_reverse_index.go:77-130)."""
    if not arrays:
        return np.empty(0, dtype=np.int64)
    out = arrays[0]
    for a in arrays[1:]:
        if out.size == 0:
            return out
        out = out[np.isin(out, a, assume_unique=True)]
    return out


def union_many(arrays: list[np.ndarray]) -> np.ndarray:
    """Dedup union in ascending order (UnionOfSkipList, :133-156)."""
    if not arrays:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(arrays))


# -- exhaustive (term-at-a-time) scorer ---------------------------------------

def eval_bool_tree(node: dict, leaf_ids: dict[str, np.ndarray]) -> np.ndarray:
    """Evaluate a TermQuery dict over per-term candidate id arrays.

    A node may carry ``must_not`` alongside its positive part (nested
    ES bool exclusion): the node's matches are its positive matches
    MINUS the union of the ``must_not`` subtrees — evaluated against
    the node's own candidate set, never a corpus-sized complement.
    Leaf keys of the form ``field\\x01word``; pseudo-leaves (phrase
    match sets, key prefix ``\\x02``) resolve through the same
    ``leaf_ids`` map — the caller injects their per-segment id arrays."""
    if "keyword" in node:
        kw = node["keyword"]
        f = kw.get("field", "")
        # pseudo-leaf keys ("\x02..." — phrase match sets) contain no
        # field separator, so the whole key lands in the field slot
        key = f if f.startswith("\x02") else f"{f}\x01{kw.get('word','')}"
        return leaf_ids.get(key, np.empty(0, dtype=np.int64))
    if "must" in node:
        out = intersect_many([eval_bool_tree(c, leaf_ids)
                              for c in node["must"]])
    elif "should" in node:
        out = union_many([eval_bool_tree(c, leaf_ids)
                          for c in node["should"]])
    else:
        return np.empty(0, dtype=np.int64)
    negs = node.get("must_not")
    if negs and out.size:
        out = np.setdiff1d(
            out, union_many([eval_bool_tree(c, leaf_ids) for c in negs]),
            assume_unique=True)
    return out


def score_segment_exhaustive(
    query: dict,
    term_postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
    idf: dict[str, float],
    avgdl: float,
    k: int,
    on: int = 0,
    off: int = 0,
    or_flags=(),
    k1: float = K1,
    b: float = B,
    after: tuple[float, int] | None = None,
    exclude: dict | None = None,
    exclude_only: frozenset = frozenset(),
    min_match: int = 0,
    extra_leaf_ids: dict[str, np.ndarray] | None = None,
    demote: dict | None = None,
    demote_factor: float = 1.0,
):
    """Boolean-filter + BM25-score one segment, vectorized TAAT.

    ``term_postings``: term -> decoded (ids, tfs, dls, bits), ids ascending.
    ``after``: optional (score, doc_id) paging cursor — the top-k is taken
    over docs strictly after it in (score desc, doc_id asc) rank order.
    ``exclude``: optional must_not tree (ES bool-query semantics): its
    matches are removed from the candidate set BEFORE scoring/top-k, and
    terms appearing only in it (``exclude_only``) never contribute to a
    score. ``min_match``: minimum_should_match (ES should-clause
    semantics) — a candidate must match at least this many DISTINCT
    positive query terms (bit-filtered) to survive; survivors are scored
    over every matching term, exactly like the plain query, so
    ``min_match=1`` is bitwise-identical to no constraint. Applied
    before the paging cursor and the top-k, so a cursor taken from an
    msm result pages within the same constrained rank order.
    ``extra_leaf_ids``: pre-computed candidate id arrays for
    pseudo-leaves in the tree (phrase match sets) — they join candidate
    evaluation but NEVER score (no posting run in ``term_postings``).
    ``demote``: optional tree (ES boosting-query ``negative`` clause):
    candidates matching it STAY in the result but have their summed
    score multiplied by ``demote_factor`` (ES ``negative_boost``) —
    one float64 multiply after the fixed-order summation, applied
    BEFORE the paging cursor and the top-k so cursors page within the
    demoted rank order. Demote-only terms ride ``exclude_only`` (they
    gate the demotion match, never contribute score).
    Returns (doc_ids, scores) of the segment-local top-k, ordered by
    (score desc, doc_id asc).
    """
    filtered: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    leaf_ids: dict[str, np.ndarray] = dict(extra_leaf_ids or {})
    for t, (ids, tfs, dls, bits) in term_postings.items():
        m = filter_by_bits_vec(bits, on, off, or_flags)
        fids = ids[m]
        leaf_ids[t] = fids
        if t not in exclude_only:
            filtered[t] = (fids, bm25_u(tfs[m], dls[m], avgdl, k1, b))

    cands = eval_bool_tree(query, leaf_ids)
    if exclude is not None and cands.size:
        cands = np.setdiff1d(cands, eval_bool_tree(exclude, leaf_ids),
                             assume_unique=True)
    if min_match > 1 and cands.size:
        # distinct-term match count per candidate over the POSITIVE
        # terms (exclude-only leaves never count toward the quorum)
        counts = np.zeros(cands.size, dtype=np.int64)
        for t in filtered:
            fids = filtered[t][0]
            if fids.size == 0:
                continue
            pos = np.searchsorted(fids, cands)
            pos_c = np.clip(pos, 0, fids.size - 1)
            counts += fids[pos_c] == cands
        cands = cands[counts >= min_match]
    if cands.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    scores = np.zeros(cands.size, dtype=np.float64)
    for t in sorted(filtered):  # fixed summation order
        fids, u = filtered[t]
        if fids.size == 0:
            continue
        pos = np.searchsorted(fids, cands)
        pos_c = np.clip(pos, 0, fids.size - 1)
        hit = fids[pos_c] == cands
        scores[hit] += idf.get(t, 0.0) * u[pos_c[hit]]

    if demote is not None:
        dem = eval_bool_tree(demote, leaf_ids)
        if dem.size:
            pos = np.searchsorted(dem, cands)
            pos_c = np.clip(pos, 0, dem.size - 1)
            hit = dem[pos_c] == cands
            scores[hit] = scores[hit] * np.float64(demote_factor)

    if after is not None:
        cands, scores = _rank_after(cands, scores, after)
        if cands.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    if cands.size > k:
        # threshold-select (keeps ALL boundary ties), then sort survivors
        kth = np.partition(-scores, k - 1)[k - 1]
        keep = np.nonzero(-scores <= kth)[0]
    else:
        keep = np.arange(cands.size)
    order = keep[np.lexsort((cands[keep], -scores[keep]))][:k]
    return cands[order], scores[order]


def merge_decoded_runs(runs: list[tuple]) -> tuple:
    """Merge decoded member posting runs into ONE synonym stream.

    Lucene ``SynonymQuery`` semantics: the group behaves as a single
    pseudo-term whose tf(d) is the SUM of the member tfs in d. doc_len
    and bits are per-doc constants, so any member's value is taken.
    Input/output shape matches ``EncodedPostings.decode_all()``:
    (ids asc, tfs, dls, bits)."""
    if len(runs) == 1:
        return runs[0]
    ids = np.concatenate([r[0] for r in runs])
    tfs = np.concatenate([r[1] for r in runs])
    dls = np.concatenate([r[2] for r in runs])
    bts = np.concatenate([r[3] for r in runs])
    order = np.argsort(ids, kind="stable")
    ids, tfs, dls, bts = ids[order], tfs[order], dls[order], bts[order]
    uniq, start = np.unique(ids, return_index=True)
    return (uniq, np.add.reduceat(tfs, start), dls[start], bts[start])


def score_segment_dismax(
    term_postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
    idf: dict[str, float],
    avgdl: float,
    k: int,
    tie: float = 0.0,
    on: int = 0,
    off: int = 0,
    or_flags=(),
    k1: float = K1,
    b: float = B,
):
    """Lucene ``DisjunctionMaxQuery`` over term leaves, vectorized TAAT.

    score(d) = (1 - tie) * max_t c_t(d) + tie * sum_t c_t(d) with
    c_t = idf_t * u(tf, dl) — algebraically Lucene's
    ``max + tie * sumOfOthers``, computed in the form whose endpoints
    are bitwise exact: tie=0 is the pure max, tie=1 is bitwise the flat
    OR query's sum (same accumulation order as the exhaustive scorer).
    The best-matching term dominates and the others contribute only
    through the tie-breaker, so a doc matching one term strongly
    outranks a doc matching every term weakly (the "pick the best
    clause" semantics BM25's plain sum inverts). Returns the
    segment-local top-k ordered (score desc, doc_id asc), same contract
    as :func:`score_segment_exhaustive`."""
    filtered: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t, (ids, tfs, dls, bits) in term_postings.items():
        m = filter_by_bits_vec(bits, on, off, or_flags)
        filtered[t] = (ids[m], bm25_u(tfs[m], dls[m], avgdl, k1, b))
    cands = union_many([f[0] for f in filtered.values()])
    if cands.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    mx = np.zeros(cands.size, dtype=np.float64)
    sm = np.zeros(cands.size, dtype=np.float64)
    for t in sorted(filtered):  # fixed accumulation order (rank identity)
        fids, u = filtered[t]
        if fids.size == 0:
            continue
        pos = np.searchsorted(fids, cands)
        pos_c = np.clip(pos, 0, fids.size - 1)
        hit = fids[pos_c] == cands
        c = np.zeros(cands.size, dtype=np.float64)
        c[hit] = idf.get(t, 0.0) * u[pos_c[hit]]
        sm += c
        np.maximum(mx, c, out=mx)
    scores = (1.0 - tie) * mx + tie * sm
    if cands.size > k:
        kth = np.partition(-scores, k - 1)[k - 1]
        keep = np.nonzero(-scores <= kth)[0]
    else:
        keep = np.arange(cands.size)
    order = keep[np.lexsort((cands[keep], -scores[keep]))][:k]
    return cands[order], scores[order]


# -- block-max interval scorers (WAND / conjunctive) ---------------------------
#
# Both pruned scorers share one vectorized structure: the doc-id space is
# cut into INTERVALS by the union of every query term's block boundaries
# (block_last), so within an interval each term is covered by exactly one
# block and the interval's admissible upper bound is a plain numpy sum of
# block maxima — precomputed for ALL intervals in a handful of vectorized
# passes before the walk starts. The walk is then interval-at-a-time, not
# doc-at-a-time: an interval whose bound cannot beat the heap threshold
# is skipped with ONE float compare (no decode, no cursor bookkeeping),
# and a passing interval is scored as a mini-TAAT — decode the covering
# blocks once each (cached), bit-filter, union (WAND) or intersect
# (conjunction) the candidate ids, and accumulate idf*u per term in
# lexicographic term order: the exact float op order of the exhaustive
# scorer, so every path hashes identically.
#
# Lossless for (score desc, doc_id asc) top-k: intervals ascend, so docs
# are emitted in globally ascending id order; with the heap keyed
# (score, -doc_id) an equal-score later doc can never displace an earlier
# one, and a candidate enters iff its score STRICTLY beats the threshold.
# Block maxima are nextafter-rounded up at build, so the bound is
# admissible. Strictly stronger pruning than the reference's early-exit-
# on-exhaustion (skiplist_reverse_index.go:112-126), and ~block_size
# fewer interpreter iterations than a per-doc pivot walk (the round-2
# serving bottleneck: ~40 us of Python per pivot).


class _FilteredBlocks:
    """Lazy per-block decode + bit-filter + idf*u cache for one term.

    Adaptive decode granularity: selective queries touch few blocks, so
    blocks decode individually on demand; but once ~3% of the term's
    blocks have missed the cache (min 4 misses — a dense, barely-prunable
    term), the whole stream is decoded in ONE vectorized varbyte pass per
    stream and later gets serve pre-sliced views — per-block decode is
    ~10 numpy dispatches per 128 entries, which dominated the dense case.
    """

    __slots__ = ("enc", "idf", "avgdl", "k1", "b", "on", "off", "or_flags",
                 "cache", "misses", "full")

    def __init__(self, enc: EncodedPostings, idf: float, avgdl: float,
                 k1: float, b: float, on: int, off: int, or_flags):
        self.enc = enc
        self.idf = idf
        self.avgdl = avgdl
        self.k1 = k1
        self.b = b
        self.on = on
        self.off = off
        self.or_flags = or_flags
        self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.misses = 0
        self.full: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None

    def _filter(self, ids, tfs, dls, bts):
        m = filter_by_bits_vec(bts, self.on, self.off, self.or_flags)
        return (ids[m], m,
                self.idf * bm25_u(tfs[m], dls[m], self.avgdl, self.k1, self.b))

    def _densify(self) -> None:
        ids, tfs, dls, bts = self.enc.decode_all()
        fids, m, fc = self._filter(ids, tfs, dls, bts)
        blk_of = np.arange(self.enc.df, dtype=np.int64) // self.enc.block_size
        offs = np.searchsorted(blk_of[m], np.arange(self.enc.n_blocks + 1))
        self.full = (fids, fc, offs)
        self.cache.clear()

    def get(self, blk: int) -> tuple[np.ndarray, np.ndarray]:
        """-> (filtered ascending doc_ids, matching idf*u contributions)."""
        if self.full is not None:
            fids, fc, offs = self.full
            return fids[offs[blk]:offs[blk + 1]], fc[offs[blk]:offs[blk + 1]]
        hit = self.cache.get(blk)
        if hit is None:
            self.misses += 1
            # trip to full decode after ~3% of blocks miss (min 4): the
            # wasted per-block decodes stay bounded while truly selective
            # queries never pay the full-stream pass
            if self.misses > 4 and self.misses * self.enc.block_size * 32 > self.enc.df:
                self._densify()
                return self.get(blk)
            fids, _m, fc = self._filter(self.enc.decode_block_ids(blk),
                                        *self.enc.decode_block_vals(blk))
            hit = (fids, fc)
            self.cache[blk] = hit
        return hit


def _check_bounds(encs: list[EncodedPostings]) -> None:
    for e in encs:
        if e.df and e.block_max_u is None:
            raise ValueError(
                "EncodedPostings.with_bounds(avgdl) must be called before "
                "WAND scoring (bounds are derived at query time)")


def _rank_after(cand: np.ndarray, scores: np.ndarray, after):
    """Keep only docs strictly AFTER the ``(score, doc_id)`` cursor in
    (score desc, doc_id asc) rank order. Cursor scores come from a prior
    result of the same deterministic kernels, so the float equality in
    the tie branch is exact (bitwise-identical recomputation)."""
    cs, cd = after
    m = (scores < cs) | ((scores == cs) & (cand > cd))
    return cand[m], scores[m]


def _push_candidates(heap, k, theta, cand, scores, after=None) -> float:
    """Feed one interval's scored candidates (ascending ids) into the
    (score, -doc_id) min-heap; returns the updated threshold. Candidates
    ascend past every existing heap id, so prefiltering on score > theta
    can never drop a doc that would have entered later. ``after`` drops
    docs at-or-before the paging cursor BEFORE they can enter the heap,
    so the threshold only ever rises from post-cursor docs (pruning
    stays lossless for the page's true top-k)."""
    import heapq

    if after is not None:
        cand, scores = _rank_after(cand, scores, after)
    if len(heap) >= k:
        sel = np.nonzero(scores > theta)[0]
    else:
        sel = range(len(cand))
    for j in sel:
        item = (float(scores[j]), -int(cand[j]))
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
    return heap[0][0] if len(heap) >= k else -np.inf


def score_segment_wand(
    postings: dict[str, EncodedPostings],
    idf: dict[str, float],
    avgdl: float,
    k: int,
    on: int = 0,
    off: int = 0,
    or_flags=(),
    k1: float = K1,
    b: float = B,
    after: tuple[float, int] | None = None,
):
    """Block-max WAND top-k over a flat OR-of-terms query in one segment
    (interval-at-a-time; see the section comment above for the pruning
    and losslessness argument).

    ``after``: optional (score, doc_id) paging cursor — only docs
    strictly after it in (score desc, doc_id asc) rank order are
    admitted to the heap (deep paging without per-segment offset+k
    growth; the interval bound check is unchanged and stays admissible
    because the heap threshold only rises from admitted docs).

    Returns (doc_ids, scores) ordered by (score desc, doc_id asc).
    """
    terms = sorted(t for t, e in postings.items() if e.df > 0)
    if not terms:
        return _finalize_heap([])
    encs = [postings[t] for t in terms]
    _check_bounds(encs)
    weights = [idf.get(t, 0.0) for t in terms]

    bounds = np.unique(np.concatenate([e.block_last for e in encs]))
    blk_idx: list[np.ndarray] = []
    ub = np.zeros(len(bounds), dtype=np.float64)
    for e, w in zip(encs, weights):
        bi = np.searchsorted(e.block_last, bounds, side="left")
        blk_idx.append(bi)
        valid = bi < e.n_blocks
        ub[valid] += w * e.block_max_u[bi[valid]]

    filt = [_FilteredBlocks(e, w, avgdl, k1, b, on, off, or_flags)
            for e, w in zip(encs, weights)]
    heap: list[tuple[float, int]] = []
    theta = -np.inf
    prev = np.iinfo(np.int64).min  # interval i covers doc ids (prev, hi]
    for i in range(len(bounds)):
        lo, prev = prev, int(bounds[i])
        hi = prev
        if ub[i] <= theta:
            continue
        slices: list[tuple[np.ndarray, np.ndarray]] = []
        for ti in range(len(terms)):
            bi = int(blk_idx[ti][i])
            if bi >= encs[ti].n_blocks:
                continue
            fids, fc = filt[ti].get(bi)
            s = int(np.searchsorted(fids, lo, side="right"))
            e_ = int(np.searchsorted(fids, hi, side="right"))
            if e_ > s:
                slices.append((fids[s:e_], fc[s:e_]))
        if not slices:
            continue
        if len(slices) == 1:
            # 0.0 + x == x bitwise, so this equals the general path
            cand, scores = slices[0][0], slices[0][1]
        else:
            cand = np.unique(np.concatenate([sl[0] for sl in slices]))
            scores = np.zeros(len(cand), dtype=np.float64)
            for fids_s, fc_s in slices:  # lex term order = TAAT float order
                pos = np.searchsorted(fids_s, cand)
                pos_c = np.clip(pos, 0, len(fids_s) - 1)
                hit = fids_s[pos_c] == cand
                scores[hit] += fc_s[pos_c[hit]]
        theta = _push_candidates(heap, k, theta, cand, scores, after)
    return _finalize_heap(heap)


def score_segment_conjunctive(
    postings: dict[str, EncodedPostings],
    idf: dict[str, float],
    avgdl: float,
    k: int,
    on: int = 0,
    off: int = 0,
    or_flags=(),
    k1: float = K1,
    b: float = B,
    after: tuple[float, int] | None = None,
):
    """Top-k over a flat AND-of-terms query: interval-at-a-time block-max
    intersection (the BMW bound applied to the conjunction; see the
    section comment above). ``after``: paging cursor, same contract as
    :func:`score_segment_wand`.

    Per passing interval the RAREST term is sliced first — if its slice
    is empty the interval is abandoned before any other term decodes a
    block, which preserves the rare-term-drives behavior of a galloping
    skip-pointer intersection (reference: skiplist_reverse_index.go:
    77-130) in vectorized form.

    ``postings`` must contain EVERY query term with df > 0 in this
    segment; callers pass the segment's rows — a missing term means the
    intersection is empty here (the reference's early-exit: an empty list
    nils the whole intersection, skiplist_reverse_index.go:88-90).

    Returns (doc_ids, scores) ordered by (score desc, doc_id asc).
    """
    if not postings or any(enc.df == 0 for enc in postings.values()):
        return _finalize_heap([])
    terms = sorted(postings)  # summation order = TAAT float order
    encs = [postings[t] for t in terms]
    _check_bounds(encs)
    weights = [idf.get(t, 0.0) for t in terms]
    probe_order = sorted(range(len(terms)), key=lambda ti: encs[ti].df)

    # no candidate can exceed the smallest per-term last doc id
    max_doc = min(int(e.block_last[-1]) for e in encs)
    bounds = np.unique(np.concatenate([e.block_last for e in encs]))
    bounds = bounds[bounds <= max_doc]
    blk_idx: list[np.ndarray] = []
    ub = np.zeros(len(bounds), dtype=np.float64)
    valid_all = np.ones(len(bounds), dtype=bool)
    for e, w in zip(encs, weights):
        bi = np.searchsorted(e.block_last, bounds, side="left")
        blk_idx.append(bi)
        v = bi < e.n_blocks
        valid_all &= v
        ub[v] += w * e.block_max_u[bi[v]]
    ub[~valid_all] = -np.inf

    filt = [_FilteredBlocks(e, w, avgdl, k1, b, on, off, or_flags)
            for e, w in zip(encs, weights)]
    heap: list[tuple[float, int]] = []
    theta = -np.inf
    prev = np.iinfo(np.int64).min
    for i in range(len(bounds)):
        lo, prev = prev, int(bounds[i])
        hi = prev
        if ub[i] <= theta:  # also skips intervals some term can't cover
            continue
        cand: np.ndarray | None = None
        for ti in probe_order:  # rarest first: usually exits on slice 1
            fids, _fc = filt[ti].get(int(blk_idx[ti][i]))
            s = int(np.searchsorted(fids, lo, side="right"))
            e_ = int(np.searchsorted(fids, hi, side="right"))
            sl = fids[s:e_]
            cand = sl if cand is None else cand[
                np.isin(cand, sl, assume_unique=True)]
            if cand.size == 0:
                break
        if cand is None or cand.size == 0:
            continue
        scores = np.zeros(len(cand), dtype=np.float64)
        for ti in range(len(terms)):  # lex term order = TAAT float order
            fids, fc = filt[ti].get(int(blk_idx[ti][i]))
            scores += fc[np.searchsorted(fids, cand)]
        theta = _push_candidates(heap, k, theta, cand, scores, after)
    return _finalize_heap(heap)


def _finalize_heap(heap):
    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    doc_ids = np.array([-d for _, d in out], dtype=np.int64)
    scores = np.array([s for s, _ in out], dtype=np.float64)
    return doc_ids, scores
