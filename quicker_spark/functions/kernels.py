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
    """Evaluate a TermQuery dict over per-term candidate id arrays."""
    if "keyword" in node:
        kw = node["keyword"]
        key = f"{kw.get('field','')}\x01{kw.get('word','')}"
        return leaf_ids.get(key, np.empty(0, dtype=np.int64))
    if "must" in node:
        return intersect_many([eval_bool_tree(c, leaf_ids) for c in node["must"]])
    if "should" in node:
        return union_many([eval_bool_tree(c, leaf_ids) for c in node["should"]])
    return np.empty(0, dtype=np.int64)


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
):
    """Boolean-filter + BM25-score one segment, vectorized TAAT.

    ``term_postings``: term -> decoded (ids, tfs, dls, bits), ids ascending.
    Returns (doc_ids, scores) of the segment-local top-k, ordered by
    (score desc, doc_id asc).
    """
    filtered: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    leaf_ids: dict[str, np.ndarray] = {}
    for t, (ids, tfs, dls, bits) in term_postings.items():
        m = filter_by_bits_vec(bits, on, off, or_flags)
        fids = ids[m]
        leaf_ids[t] = fids
        filtered[t] = (fids, bm25_u(tfs[m], dls[m], avgdl, k1, b))

    cands = eval_bool_tree(query, leaf_ids)
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

    if cands.size > k:
        # threshold-select (keeps ALL boundary ties), then sort survivors
        kth = np.partition(-scores, k - 1)[k - 1]
        keep = np.nonzero(-scores <= kth)[0]
    else:
        keep = np.arange(cands.size)
    order = keep[np.lexsort((cands[keep], -scores[keep]))][:k]
    return cands[order], scores[order]


# -- block-max WAND top-k (disjunctive queries) --------------------------------

class _WandCursor:
    """Per-term posting cursor with lazy block decode + skip pointers."""

    __slots__ = ("enc", "idf", "blk", "pos", "ids", "vals", "exhausted", "ub")

    def __init__(self, enc: EncodedPostings, idf: float):
        if enc.df and enc.block_max_u is None:
            raise ValueError(
                "EncodedPostings.with_bounds(avgdl) must be called before "
                "WAND scoring (bounds are derived at query time)")
        self.enc = enc
        self.idf = idf
        self.blk = 0
        self.pos = 0
        self.ids = enc.decode_block_ids(0)
        self.vals = None  # (tfs, dls, bits) decoded lazily on scoring
        self.exhausted = enc.df == 0
        # term-level upper bound for WAND pivoting
        self.ub = idf * float(enc.block_max_u.max()) if enc.df else 0.0

    def cur_doc(self) -> int:
        return int(self.ids[self.pos]) if not self.exhausted else np.iinfo(np.int64).max

    def cur_block_ub(self) -> float:
        return self.idf * float(self.enc.block_max_u[self.blk])

    def _enter_block(self, blk: int):
        if blk >= self.enc.n_blocks:
            self.exhausted = True
            return
        self.blk = blk
        self.ids = self.enc.decode_block_ids(blk)
        self.vals = None
        self.pos = 0

    def seek(self, target: int):
        """Advance to the first posting with doc_id >= target."""
        if self.exhausted:
            return
        if target > int(self.enc.block_last[self.blk]):
            nxt = int(np.searchsorted(self.enc.block_last, target, side="left"))
            self._enter_block(nxt)
            if self.exhausted:
                return
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= len(self.ids):  # defensive; block_last guarantees not
            self._enter_block(self.blk + 1)

    def seek_shallow(self, target: int):
        """Block-level skip: jump to the block that may contain ``target``
        WITHOUT decoding intermediate blocks (the block-max WAND move)."""
        if self.exhausted:
            return
        nxt = int(np.searchsorted(self.enc.block_last, target, side="left"))
        if nxt != self.blk:
            self._enter_block(nxt)
            if self.exhausted:
                return
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= len(self.ids):
            self._enter_block(self.blk + 1)

    def score_at(self, doc: int, avgdl: float, k1: float, b: float,
                 on: int, off: int, or_flags):
        """(contribution, passes_flags) if cur_doc == doc else (0, None)."""
        if self.exhausted or int(self.ids[self.pos]) != doc:
            return 0.0, None
        if self.vals is None:
            self.vals = self.enc.decode_block_vals(self.blk)
        tfs, dls, bts = self.vals
        bitv = int(bts[self.pos])
        ok = (bitv & on) == on and (bitv & off) == 0
        if ok:
            for f in or_flags:
                if f > 0 and bitv & f == 0:
                    ok = False
                    break
        if not ok:
            return 0.0, False
        u = float(bm25_u(tfs[self.pos:self.pos + 1], dls[self.pos:self.pos + 1],
                         avgdl, k1, b)[0])
        return self.idf * u, True

    def advance(self):
        self.pos += 1
        if self.pos >= len(self.ids):
            self._enter_block(self.blk + 1)


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
):
    """Block-max WAND top-k over a flat OR-of-terms query in one segment.

    Lossless for (score desc, doc_id asc) top-k: docs are emitted in
    ascending id order, so with the heap keyed (score, -doc_id) an
    equal-score later doc can never displace an earlier one, and the
    standard strict ``ub > threshold`` pivot condition preserves exact
    tie-breaking. Block maxima are nextafter-rounded up at build, so the
    bound is admissible. Strictly stronger pruning than the reference's
    early-exit-on-exhaustion (skiplist_reverse_index.go:112-126).

    Returns (doc_ids, scores) ordered by (score desc, doc_id asc).
    """
    import heapq

    cursors = [_WandCursor(enc, idf.get(t, 0.0)) for t, enc in postings.items()
               if enc.df > 0]
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
    INF = np.iinfo(np.int64).max

    while True:
        live = [c for c in cursors if not c.exhausted]
        if not live:
            break
        live.sort(key=lambda c: c.cur_doc())
        theta = heap[0][0] if len(heap) >= k else -np.inf

        # WAND pivot: first prefix whose ub sum exceeds theta
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(live):
            acc += c.ub
            if acc > theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # no doc can beat the threshold
        pivot = live[pivot_idx].cur_doc()
        if pivot == INF:
            break

        if live[0].cur_doc() == pivot:
            # all prefix terms aligned on pivot: block-max refinement
            bm = 0.0
            j = pivot_idx
            while j < len(live) and live[j].cur_doc() == pivot:
                j += 1
            for c in live[:j]:
                bm += c.cur_block_ub()
            if bm > theta:
                score = 0.0
                any_pass = False
                aligned = [c for c in live[:j]]
                # fixed summation order for rank identity
                aligned_scores = []
                for c in aligned:
                    contrib, passed = c.score_at(pivot, avgdl, k1, b, on, off, or_flags)
                    if passed:
                        any_pass = True
                    aligned_scores.append(contrib)
                score = float(np.sum(np.array(aligned_scores, dtype=np.float64)))
                if any_pass:
                    item = (score, -pivot)
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
                for c in aligned:
                    c.advance()
            else:
                # block-level skip: jump past the nearest block boundary,
                # clamped to the next list's current doc — docs in between
                # draw only on lists[:j], whose block-max sum can't beat
                # theta (Ding & Suel BMW GetNewCandidate)
                boundary = min(int(c.enc.block_last[c.blk]) for c in live[:j]
                               if not c.exhausted)
                target = boundary + 1
                if j < len(live):
                    target = min(target, live[j].cur_doc())
                if target <= pivot:
                    target = pivot + 1
                for c in live[:j]:
                    c.seek_shallow(max(target, c.cur_doc()))
        else:
            # advance pre-pivot terms up to the pivot
            for c in live[:pivot_idx]:
                if c.cur_doc() < pivot:
                    c.seek(pivot)

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    doc_ids = np.array([-d for _, d in out], dtype=np.int64)
    scores = np.array([s for s, _ in out], dtype=np.float64)
    return doc_ids, scores


# -- conjunctive (AND) block-max top-k -----------------------------------------

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
):
    """Top-k over a flat AND-of-terms query with skip-pointer intersection
    and block-max pruning.

    The exhaustive TAAT path decodes EVERY posting of every query term;
    this kernel is the scale path for conjunctions: the rarest term drives,
    the other cursors advance by galloping seek over the block_last skip
    pointers (only blocks that can contain a candidate are decoded —
    the reference's whole intersection design, skiplist_reverse_index.go:
    77-130, generalized with the block-skip the skiplist gave it), and a
    candidate's values are decoded only when the sum of the current block
    maxima beats the heap threshold (the BMW bound applied to the
    conjunction).

    ``postings`` must contain EVERY query term with df > 0 in this
    segment; callers pass the segment's rows — a missing term means the
    intersection is empty here (the reference's early-exit: an empty list
    nils the whole intersection, skiplist_reverse_index.go:88-90).

    Lossless for (score desc, doc_id asc) top-k for the same reasons as
    WAND: ascending-id emission + (score, -doc_id) heap + admissible
    bounds. Returns (doc_ids, scores) ordered by (score desc, doc_id asc).
    """
    import heapq

    def _empty():
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    if not postings or any(enc.df == 0 for enc in postings.values()):
        return _empty()
    # contribution summation in lexicographic term order — the exact float
    # op order of the TAAT scorer, so both paths hash identically
    terms_sorted = sorted(postings)
    sum_order = {t: i for i, t in enumerate(terms_sorted)}
    cursors = [(t, _WandCursor(postings[t], idf.get(t, 0.0)))
               for t in sorted(postings, key=lambda t: postings[t].df)]
    driver = cursors[0][1]
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
    contribs = np.zeros(len(cursors), dtype=np.float64)

    while not driver.exhausted:
        target = driver.cur_doc()
        aligned = True
        for _t, c in cursors[1:]:
            c.seek(target)
            if c.exhausted:
                return _finalize_heap(heap)
            if c.cur_doc() != target:
                target = c.cur_doc()
                aligned = False
                break
        if not aligned:
            driver.seek(target)
            continue

        theta = heap[0][0] if len(heap) >= k else -np.inf
        block_ub = 0.0
        for _t, c in cursors:
            block_ub += c.cur_block_ub()
        if block_ub > theta:
            passed = True
            for t, c in cursors:
                contrib, ok = c.score_at(target, avgdl, k1, b, on, off, or_flags)
                if ok is False:
                    passed = False
                    break
                contribs[sum_order[t]] = contrib
            if passed:
                score = float(np.sum(contribs))
                item = (score, -target)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
            driver.advance()
        else:
            # no doc in the current block combination can beat theta:
            # skip past the nearest block boundary without decoding values
            boundary = min(int(c.enc.block_last[c.blk]) for _t, c in cursors)
            driver.seek_shallow(max(boundary + 1, target + 1))

    return _finalize_heap(heap)


def _finalize_heap(heap):
    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    doc_ids = np.array([-d for _, d in out], dtype=np.int64)
    scores = np.array([s for s, _ in out], dtype=np.float64)
    return doc_ids, scores
