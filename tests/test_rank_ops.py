"""Device rank/LF/resolve kernels vs naive host oracles."""

import jax.numpy as jnp
import numpy as np

from hisat2_tpu.index.builder import suffix_array
from hisat2_tpu.index.format import fuse_blocked
from hisat2_tpu.ops import rank as rk
from hisat2_tpu.ops import resolve as rs


def _bwt_of(seq):
    sa = suffix_array(seq)
    bwt = np.where(sa > 0, seq[np.maximum(sa - 1, 0)], 0)
    zrow = int(np.flatnonzero(sa == 0)[0])
    return sa, bwt, zrow


def test_rank_matches_naive(small_index, rng):
    idx, seq = small_index
    sa, bwt, zrow = _bwt_of(seq)
    rows = idx.meta.rows
    i = rng.integers(0, rows + 1, 500).astype(np.int32)
    c = rng.integers(0, 4, 500).astype(np.int32)
    blocked = jnp.asarray(fuse_blocked(idx.occ, idx.bwt_words))
    got = np.asarray(rk.rank(blocked, idx.meta.zrow,
                             jnp.asarray(i), jnp.asarray(c)))
    for k in range(500):
        expect = int((bwt[:i[k]] == c[k]).sum())
        if c[k] == 0 and zrow < i[k]:
            expect -= 1
        assert got[k] == expect, (i[k], c[k])


def test_lf_is_sa_shift(small_index, rng):
    """SA[LF(r)] == SA[r] - 1 for all non-sentinel rows."""
    idx, seq = small_index
    sa, bwt, zrow = _bwt_of(seq)
    rows = idx.meta.rows
    r = rng.integers(0, rows, 300).astype(np.int32)
    r = r[r != zrow]
    c = bwt[r].astype(np.int32)
    blocked = jnp.asarray(fuse_blocked(idx.occ, idx.bwt_words))
    got = np.asarray(rk.lf(blocked, jnp.asarray(idx.fchr), idx.meta.zrow,
                           jnp.asarray(r), jnp.asarray(c)))
    inv = np.zeros(rows, np.int64)
    inv[sa] = np.arange(rows)
    expect = inv[(sa[r] - 1) % (idx.meta.n + 1)]
    np.testing.assert_array_equal(got, expect)


def test_mark_rank(small_index, rng):
    idx, seq = small_index
    sa, _, _ = _bwt_of(seq)
    marked = (sa & idx.meta.off_mask) == 0
    i = rng.integers(0, idx.meta.rows + 1, 300).astype(np.int32)
    got = np.asarray(rk.mark_rank(jnp.asarray(idx.mark_words),
                                  jnp.asarray(idx.mark_chk), jnp.asarray(i)))
    expect = np.array([marked[:k].sum() for k in i])
    np.testing.assert_array_equal(got, expect)


def test_resolve_rows(small_index, rng):
    idx, seq = small_index
    sa, _, _ = _bwt_of(seq)
    r = rng.integers(0, idx.meta.rows, 400).astype(np.int32)
    got = np.asarray(rs.resolve_rows(
        jnp.asarray(fuse_blocked(idx.occ, idx.bwt_words)),
        jnp.asarray(idx.fchr), jnp.asarray(idx.mark_words),
        jnp.asarray(idx.mark_chk), jnp.asarray(idx.sa_marked),
        idx.meta.zrow, idx.meta.off_rate, jnp.asarray(r)))
    np.testing.assert_array_equal(got, sa[r])


def test_resolve_rows_sparse_matches_dense(rng):
    # the live-compacted chunk-walked resolve must be bit-identical to
    # the dense walk on live slots (dead slots return 0 by contract).
    # Built with off_rate=4: the sparse path only exists for SAMPLED SA
    # (full-SA indexes resolve by direct gather).
    from hisat2_tpu.index.builder import build_fm_index
    r0 = np.random.default_rng(777)
    seq = r0.integers(0, 4, 20000).astype(np.uint8)
    idx = build_fm_index([("chr_t", seq)], off_rate=4)
    assert idx.meta.off_rate == 4
    sa, _, _ = _bwt_of(seq)
    M = 4096
    r = rng.integers(0, idx.meta.rows, M).astype(np.int32)
    live = rng.random(M) < 0.17
    blocked = jnp.asarray(fuse_blocked(idx.occ, idx.bwt_words))
    args = (blocked, jnp.asarray(idx.fchr), jnp.asarray(idx.mark_words),
            jnp.asarray(idx.mark_chk), jnp.asarray(idx.sa_marked),
            idx.meta.zrow, idx.meta.off_rate)
    for chunk in (512, 1024, M):        # multi-chunk, 2-chunk, dense-path
        got = np.asarray(rs.resolve_rows_sparse(
            *args, jnp.asarray(r), jnp.asarray(live), chunk=chunk))
        np.testing.assert_array_equal(got[live], sa[r][live])
        np.testing.assert_array_equal(got[~live], 0)
    # all-dead and all-live edges
    for lv in (np.zeros(M, bool), np.ones(M, bool)):
        got = np.asarray(rs.resolve_rows_sparse(
            *args, jnp.asarray(r), jnp.asarray(lv), chunk=512))
        np.testing.assert_array_equal(got[lv], sa[r][lv])


def test_search_lanes_live_matches_dense(small_index, rng):
    # chunked live-lane search must reproduce the dense scan's hit slots
    # (the fields the prefix re-search consumes) for every lane
    import jax.numpy as jnp
    from hisat2_tpu.ops import search as se
    from hisat2_tpu.index.format import fuse_blocked
    idx, seq = small_index
    B, L = 96, 50
    reads = np.zeros((B, L), np.int32)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        kind = i % 3
        if kind == 0:
            lens[i] = 0                            # dead lane
        elif kind == 1:
            lens[i] = rng.integers(1, 16)          # sub-min_hit_len
        else:
            lens[i] = rng.integers(20, L + 1)
            s = rng.integers(0, len(seq) - L)
            reads[i, :lens[i]] = seq[s:s + lens[i]]
    blocked = jnp.asarray(fuse_blocked(idx.occ, idx.bwt_words))

    def fn(rr, ll):
        return se.partial_search(blocked, jnp.asarray(idx.fchr),
                                 idx.meta.zrow, idx.meta.rows, rr, ll,
                                 4, 16, 16)

    dense = fn(jnp.asarray(reads), jnp.asarray(lens))
    live = se.search_lanes_live(fn, jnp.asarray(reads),
                                jnp.asarray(lens), 16, chunk=32)
    for f in ("top", "bot", "lo", "hi", "nh"):
        np.testing.assert_array_equal(
            np.asarray(getattr(live, f)), np.asarray(getattr(dense, f)),
            err_msg=f)


def test_live_pen_prefix_matches_dense_planes(small_index, rng):
    # the compacted injection-scalar helper must equal cumsum+gather of
    # the dense pen_planes on live columns (and 0 on dead ones)
    import jax.numpy as jnp
    from hisat2_tpu.ops import extend as ex
    idx, seq = small_index
    N, J, L = 40, 14, 60
    reads = rng.integers(0, 4, (N, L)).astype(np.int32)
    reads[rng.random((N, L)) < 0.02] = 4          # some N columns
    quals = rng.integers(20, 41, (N, L)).astype(np.int32)
    lens = rng.integers(30, L + 1, N).astype(np.int32)
    fresh = rng.integers(-5, idx.meta.n, (N, J)).astype(np.int32)
    live = rng.random((N, J)) < 0.3
    xq = rng.integers(0, L + 1, (N, J)).astype(np.int32)
    mm_pen = jnp.asarray(np.arange(64, dtype=np.int32) // 10 + 2)
    planes = ex.pen_planes(jnp.asarray(idx.ref_words), idx.meta.n,
                           jnp.asarray(reads), jnp.asarray(quals),
                           jnp.asarray(lens), jnp.asarray(fresh),
                           mm_pen, 1)
    pen = np.asarray(planes.pen)
    mmr = np.asarray(planes.mm_raw).astype(np.int32)
    colm = np.arange(L)[None, None, :] < xq[:, :, None]
    for chunk in (128, 4096, N * J):
        tot_f, tot_m, [(pf, pm)] = ex.live_pen_prefix(
            jnp.asarray(idx.ref_words), idx.meta.n, jnp.asarray(reads),
            jnp.asarray(quals), jnp.asarray(lens), mm_pen, 1,
            jnp.asarray(fresh), jnp.asarray(live), [jnp.asarray(xq)],
            chunk=chunk)
        np.testing.assert_array_equal(
            np.asarray(tot_f), np.where(live, pen.sum(2), 0))
        np.testing.assert_array_equal(
            np.asarray(tot_m), np.where(live, mmr.sum(2), 0))
        np.testing.assert_array_equal(
            np.asarray(pf), np.where(live, (pen * colm).sum(2), 0))
        np.testing.assert_array_equal(
            np.asarray(pm), np.where(live, (mmr * colm).sum(2), 0))


def test_joined_to_ref(multi_index):
    idx, seqs = multi_index
    fj = jnp.asarray(idx.frag_joined)
    fr = jnp.asarray(idx.frag_ref)
    fo = jnp.asarray(idx.frag_off)
    # positions inside fragment 0 map back to c1 coordinates
    pos = jnp.asarray(np.array([0, 10, 500], np.int32))
    rid, roff, ok = rs.joined_to_ref(fj, fr, fo, pos, jnp.full((3,), 10, jnp.int32))
    assert np.all(np.asarray(ok))
    assert np.all(np.asarray(rid) == 0)
    np.testing.assert_array_equal(np.asarray(roff), [0, 10, 500])
    # interval crossing the first fragment boundary is rejected
    end = int(idx.frag_joined[1])
    rid2, _, ok2 = rs.joined_to_ref(
        fj, fr, fo, jnp.asarray([end - 5], dtype=jnp.int32),
        jnp.asarray([10], dtype=jnp.int32))
    assert not bool(np.asarray(ok2)[0])


def test_search_event_stream_matches_reference_impl(small_index):
    """The event-stream partial_search must reproduce the original
    scan-state implementation bit-for-bit on randomized reads."""
    import jax.numpy as jnp
    import numpy as np

    from hisat2_tpu.ops import search as S

    idx, seq = small_index
    rng = np.random.default_rng(123)
    B, L = 64, 100
    reads = np.empty((B, L), np.int32)
    lens = np.empty(B, np.int32)
    for i in range(B):
        ln = int(rng.integers(30, L + 1)) if i % 3 else L
        st = int(rng.integers(0, len(seq) - ln))
        r = seq[st:st + ln].astype(np.int32)
        # mutations + Ns + random tails force restarts / segmentation
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, ln))
            r[p] = rng.integers(0, 5)
        if i % 5 == 0:
            r = rng.integers(0, 4, ln).astype(np.int32)
        reads[i, :ln] = r
        reads[i, ln:] = 0
        lens[i] = ln
    d = idx.to_device()
    args = (d.blocked, d.fchr, idx.meta.zrow, idx.meta.rows,
            jnp.asarray(reads), jnp.asarray(lens), 6, 16, 8)
    a = S._partial_search_ref(*args)
    b = S.partial_search(*args)
    for f in a._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            err_msg=f)


def test_partial_search2_equivalence():
    """The bigram double-step scan must produce bit-identical
    PartialHits to the single-step scan (events, hit slots, round logs)
    across even/odd lengths, Ns, mismatches, and variable lens."""
    import numpy as np
    import jax.numpy as jnp

    from hisat2_tpu.index.builder import build_fm_index
    from hisat2_tpu.index.format import fuse_blocked
    from hisat2_tpu.ops import search as so

    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, 120000).astype(np.int8)
    idx = build_fm_index([("c", g)])
    blocked = jnp.asarray(fuse_blocked(idx.occ, idx.bwt_words,
                                       idx.occ2, idx.bwt2_words))
    fchr = jnp.asarray(idx.fchr)
    ftab2 = jnp.asarray(idx.ftab2_top)
    B = 64
    for L in (100, 101, 75):
        reads = np.zeros((B, L), np.int32)
        lens = np.full(B, L, np.int32)
        for i in range(B):
            o = int(rng.integers(0, len(g) - L))
            r = g[o:o + L].astype(np.int32)
            for _ in range(int(rng.integers(0, 4))):
                p = int(rng.integers(0, L))
                r[p] = (r[p] + 1 + int(rng.integers(3))) % 4
            if i % 7 == 0:
                r[int(rng.integers(0, L))] = 4
            if i % 11 == 0:
                lens[i] = L - int(rng.integers(1, 20))
            reads[i] = r
        a = so.partial_search(blocked, fchr, idx.meta.zrow,
                              idx.meta.rows, jnp.asarray(reads),
                              jnp.asarray(lens))
        b = so.partial_search2(blocked, fchr, ftab2, idx.meta.zrow,
                               idx.meta.zrow2, idx.meta.rows,
                               jnp.asarray(reads), jnp.asarray(lens))
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_ref_chars_block_branch_equivalence(monkeypatch):
    """The three ref_chars_block lowerings (8-word-row view, flat-slice
    gather, 128-word-row genome-scale path) produce identical chars —
    including negative/OOB starts and window margins."""
    rng = np.random.default_rng(9)
    n = 128 * 16 * 37 + 5                   # not 16- or 128-word aligned
    g = rng.integers(0, 4, n).astype(np.uint32)
    words = np.zeros(((n + 15) // 16), np.uint32)
    sh = 2 * (np.arange(n) % 16)
    np.bitwise_or.at(words, np.arange(n) // 16, g << sh)
    pad8 = np.concatenate(
        [words, np.zeros((-len(words)) % 8, np.uint32)])
    pad128 = np.concatenate(
        [words, np.zeros((-len(words)) % 128, np.uint32)])
    starts = np.concatenate([
        rng.integers(-30, n + 30, 200),
        [0, -1, n - 1, n - 150, 5]]).astype(np.int32)[None, :]
    for L in (100, 132, 57):
        base = None
        for arr, gate in ((pad8, 1 << 30), (pad8, 0), (pad128, 0)):
            monkeypatch.setattr(rk, "_ROW8_MAX_WORDS", gate)
            out = np.asarray(rk.ref_chars_block(
                jnp.asarray(arr), n, jnp.asarray(starts), L))
            if base is None:
                base = out
            else:
                assert np.array_equal(out, base)
        # and against the direct definition
        pos = starts[..., None] + np.arange(L)
        exp = np.where((pos < 0) | (pos >= n), 4,
                       g[np.clip(pos, 0, n - 1)].astype(np.int64))
        assert np.array_equal(base, exp)
