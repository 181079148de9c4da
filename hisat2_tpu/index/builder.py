"""FM index construction: FASTA -> suffix array -> packed TPU layout.

The reference builds its index with Kärkkäinen blockwise suffix sorting
(/root/reference/blockwise_sa.h) or, for graph indexes, GCSA prefix doubling
(/root/reference/gbwt_graph.h:1501).  Both are sort-dominated; here we use a
fully-vectorized prefix-doubling suffix sort (numpy lexsort) — the same
asymptotic shape as PathGraph's generation loop but over a plain text — which
handles multi-megabase references in seconds.  Whole-genome scale builds the
hierarchy of local indexes instead (one window at a time), mirroring the
reference HGFM build (hgfm.h:2150-2416).

N handling mirrors ref_read.cpp: runs of non-ACGT are *excluded* from the
joined text; each maximal ACGT stretch becomes a fragment with its own
(ref id, ref offset) record, and alignments may not span fragments.
"""

from __future__ import annotations

import numpy as np

from ..utils import bitops
from .format import (BLOCK_BASES, DEFAULT_FTAB_K, DEFAULT_OFF_RATE, FMIndex,
                     FMMeta, WORDS_PER_BLOCK)


def suffix_array(text: np.ndarray) -> np.ndarray:
    """Suffix array of `text` (uint8 codes 0..3) + implicit terminal sentinel.

    Returns int32 sa of length len(text)+1; sa[0] == len(text) (the "$"
    suffix).  Uses the native linear-time SA-IS builder (native/sais.cpp)
    when the C++ toolchain is available — ~25x faster than the numpy
    fallback and the piece that makes chromosome-scale builds practical —
    otherwise prefix doubling with numpy lexsort (O(n log^2 n)).
    """
    if len(text) >= 1 << 16:
        from ..native import suffix_array_native
        sa = suffix_array_native(text)
        if sa is not None:
            return sa.astype(np.int32) if sa.dtype != np.int32 else sa
    n = len(text)
    # Shift alphabet by +1 so 0 is the unique smallest sentinel.
    rank = np.zeros(n + 1, dtype=np.int64)
    rank[:n] = text.astype(np.int64) + 1
    k = 1
    m = n + 1
    order = np.argsort(rank, kind="stable").astype(np.int64)
    # refine ranks after initial single-char sort
    r_sorted = rank[order]
    changed = np.empty(m, dtype=np.int64)
    changed[0] = 0
    changed[1:] = (r_sorted[1:] != r_sorted[:-1]).astype(np.int64)
    new_sorted = np.cumsum(changed)
    rank[order] = new_sorted
    while rank[order[-1]] != m - 1:
        key2 = np.full(m, -1, dtype=np.int64)
        key2[: m - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        changed[0] = 0
        changed[1:] = ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(np.int64)
        new_sorted = np.cumsum(changed)
        rank[order] = new_sorted
        k <<= 1
    return order.astype(np.int32)


def _fragments_from_seqs(seqs):
    """Split (name, codes) sequences at non-ACGT runs into fragments.

    Returns (joined_codes, frag_joined[F], frag_ref[F], frag_off[F],
             ref_names, ref_lens).
    """
    joined_parts = []
    frag_joined, frag_ref, frag_off = [], [], []
    ref_names, ref_lens = [], []
    joined_len = 0
    for rid, (name, codes) in enumerate(seqs):
        ref_names.append(name)
        ref_lens.append(len(codes))
        is_acgt = codes < 4
        if not is_acgt.any():
            continue
        # boundaries of maximal ACGT runs
        d = np.diff(is_acgt.astype(np.int8))
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1) + 1
        if is_acgt[0]:
            starts = np.concatenate([[0], starts])
        if is_acgt[-1]:
            ends = np.concatenate([ends, [len(codes)]])
        for s, e in zip(starts, ends):
            joined_parts.append(codes[s:e])
            frag_joined.append(joined_len)
            frag_ref.append(rid)
            frag_off.append(int(s))
            joined_len += e - s
    joined = (np.concatenate(joined_parts) if joined_parts
              else np.zeros(0, dtype=np.uint8))
    # frag_joined is int64: the GLOBAL joined space of a multi-gigabase
    # genome exceeds int32 (shard-local tables re-narrow in the builder)
    return (joined, np.asarray(frag_joined, np.int64),
            np.asarray(frag_ref, np.int32), np.asarray(frag_off, np.int64),
            tuple(ref_names), tuple(int(x) for x in ref_lens))


def _build_ftab(text: np.ndarray, sa: np.ndarray, k: int):
    """[top,bot) for every k-mer, straight from the suffix array.

    Equivalent to GFM's ftab (gfm.h:3280 ftabLoHi) but computed by binary
    search: encode each suffix's first k chars in base 5 with sentinel 0
    (so short suffixes sort strictly below every full k-mer), then
    ftab_top/bot are searchsorted bounds over the SA-ordered key array.
    """
    n = len(text)
    t5 = np.zeros(n + k, dtype=np.int64)
    t5[:n] = text.astype(np.int64) + 1
    pows = 5 ** np.arange(k - 1, -1, -1)
    win = np.lib.stride_tricks.sliding_window_view(t5, k)[: n + 1]
    keys = win @ pows                     # key of suffix starting at p
    keys_sa = keys[sa]                    # non-decreasing
    # key of kmer m: digits (base-4) + 1, in base 5
    m = np.arange(4 ** k, dtype=np.int64)
    km = np.zeros(4 ** k, dtype=np.int64)
    for j in range(k):
        km += (((m >> (2 * (k - 1 - j))) & 3) + 1) * pows[j]
    top = np.searchsorted(keys_sa, km, side="left")
    bot = np.searchsorted(keys_sa, km, side="right")
    return top.astype(np.int32), bot.astype(np.int32)





# largest joined text per shard: keeps every row/offset (incl. diagonal
# margins) inside int32 — whole genomes shard across sub-indexes, the
# reference's 64-bit -l flavor territory (hisat2:444-457)
SHARD_LIMIT_BP = 1_900_000_000


def build_fm_index(seqs, off_rate: int = None,
                   ftab_k: int = DEFAULT_FTAB_K,
                   shard_bp: int = None):
    """Build the full TPU-layout FM index from [(name, codes), ...].

    off_rate None picks adaptively: genomes under 128 Mbp store the FULL
    suffix array (off_rate 0 — SA resolution becomes one HBM gather, the
    dominant cost of the aligner's device step); larger genomes sample
    every 16th text position like the reference (offRate 4, gfm.h).

    Genomes larger than shard_bp (default 1.9 Gbp, the int32 row bound)
    return a ShardedFMIndex: fragments are grouped greedily into
    sub-indexes, each a complete standalone FM index; the aligner runs
    every shard and merges candidates with global joined coordinates."""
    frags = _fragments_from_seqs(seqs)
    joined, frag_joined, frag_ref, frag_off, ref_names, ref_lens = frags
    n = len(joined)
    if n == 0:
        raise ValueError("reference contains no ACGT bases")
    limit = shard_bp or SHARD_LIMIT_BP
    if n > limit:
        from .format import ShardedFMIndex
        fj = np.append(np.asarray(frag_joined, np.int64), n)
        sizes = np.diff(fj)
        groups, cur, cur_bp = [], [], 0
        for fi, sz in enumerate(sizes):
            if cur and cur_bp + sz > limit:
                groups.append(cur)
                cur, cur_bp = [], 0
            cur.append(fi)
            cur_bp += int(sz)
        if cur:
            groups.append(cur)
        shards, bases = [], []
        for g in groups:
            base = int(fj[g[0]])
            gjoined = joined[fj[g[0]]:fj[g[-1] + 1]]
            gfj = [int(fj[fi]) - base for fi in g]
            shards.append(_build_single(
                gjoined, np.asarray(gfj, np.int32),
                np.asarray([frag_ref[fi] for fi in g], np.int32),
                np.asarray([frag_off[fi] for fi in g], np.int32),
                ref_names, ref_lens, off_rate, ftab_k))
            bases.append(base)
        return ShardedFMIndex(shards=shards, shard_bases=bases)
    return _build_single(joined, np.asarray(frag_joined, np.int32),
                         np.asarray(frag_ref, np.int32),
                         np.asarray(frag_off, np.int32),
                         ref_names, ref_lens, off_rate, ftab_k)


def _build_single(joined, frag_joined, frag_ref, frag_off,
                  ref_names, ref_lens, off_rate, ftab_k) -> FMIndex:
    n = len(joined)
    if off_rate is None:
        off_rate = 0 if n < (1 << 27) else 4
    rows = n + 1
    sa = suffix_array(joined)
    # BWT: L[i] = joined[sa[i]-1]; '$' where sa[i]==0
    prev = sa.astype(np.int64) - 1
    zrow = int(np.flatnonzero(sa == 0)[0])
    bwt_codes = np.where(prev >= 0, joined[np.maximum(prev, 0)], 0).astype(np.uint8)
    bwt_codes[zrow] = 0  # '$' slot packs as 0; rank corrects via zrow

    # pad rows to a whole number of blocks
    nblocks = (rows + BLOCK_BASES - 1) // BLOCK_BASES
    padded = np.zeros(nblocks * BLOCK_BASES, dtype=np.uint8)
    padded[:rows] = bwt_codes
    bwt_words = bitops.pack_2bit(padded)

    # occ checkpoints: counts of each char in bwt[0 : 128*b), '$' excluded
    onehot = np.zeros((nblocks * BLOCK_BASES, 4), dtype=np.int32)
    r_idx = np.arange(rows)
    onehot[r_idx, bwt_codes[:rows]] = 1
    onehot[zrow, 0] = 0          # '$' contributes nothing
    per_block = onehot.reshape(nblocks, BLOCK_BASES, 4).sum(axis=1)
    occ = np.zeros((nblocks + 1, 4), dtype=np.int32)
    np.cumsum(per_block, axis=0, out=occ[1:])

    # cumulative char counts C[]: fchr[c] = 1 + #{chars < c}  (the 1 is '$')
    counts = onehot.sum(axis=0)
    fchr = np.zeros(5, dtype=np.int32)
    fchr[0] = 1
    np.cumsum(counts, out=fchr[1:])
    fchr[1:] += 1

    # SA sample by *text position*: mark rows whose SA value is a multiple of
    # 2^off_rate (bounds the LF resolve-walk at 2^off_rate steps — see
    # format.py).  sa_marked lists marked rows' SA values in row order.
    marked = (sa & ((1 << off_rate) - 1)) == 0
    sa_marked = sa[marked].astype(np.int32)
    mark_bits = np.zeros(nblocks * BLOCK_BASES, dtype=np.uint32)
    mark_bits[:rows] = marked.astype(np.uint32)
    mb = mark_bits.reshape(-1, 32)
    mark_words = (mb << np.arange(32, dtype=np.uint32)[None, :]).sum(
        axis=1, dtype=np.uint32)
    per_block_marks = mark_bits.reshape(nblocks, BLOCK_BASES).sum(axis=1)
    mark_chk = np.zeros(nblocks + 1, dtype=np.int32)
    np.cumsum(per_block_marks, out=mark_chk[1:])

    ftab_top, ftab_bot = _build_ftab(joined, sa, ftab_k)

    # bigram planes: the double-step backward search consumes TWO chars
    # per gathered row (ops/search.py partial_search2; PERF.md — gathers
    # are latency-flat in row size, so halving the scan's steps is free).
    # bwt2[i] = (T[SA[i]-2], T[SA[i]-1]) packed 4-bit; the <=2 rows with
    # SA[i] < 2 pack 0 and rank2 corrects for them like zrow.  fchr2 =
    # first row of each 2-gram prefix block (the k=2 ftab top).
    prev2 = sa.astype(np.int64) - 2
    zrow2 = int(np.flatnonzero(sa == 1)[0]) if rows > 1 else -1
    sym2 = (joined[np.maximum(prev2, 0)].astype(np.uint8) * 4
            + joined[np.maximum(prev, 0)].astype(np.uint8))
    sym2 = np.where(prev2 >= 0, sym2, 0).astype(np.uint8)
    sym2[zrow] = 0
    if zrow2 >= 0:
        sym2[zrow2] = 0
    padded2 = np.zeros(nblocks * BLOCK_BASES, dtype=np.uint8)
    padded2[:rows] = sym2
    bwt2_words = bitops.pack_4bit(padded2)
    onehot2 = np.zeros((nblocks * BLOCK_BASES, 16), dtype=np.int32)
    onehot2[r_idx, sym2[:rows]] = 1
    onehot2[zrow, 0] = 0
    if zrow2 >= 0:
        onehot2[zrow2, 0] = 0
    per_block2 = onehot2.reshape(nblocks, BLOCK_BASES, 16).sum(axis=1)
    occ2 = np.zeros((nblocks + 1, 16), dtype=np.int32)
    np.cumsum(per_block2, axis=0, out=occ2[1:])
    ftab2_top, _ = _build_ftab(joined, sa, 2)

    ref_words = bitops.pack_2bit(joined)
    meta = FMMeta(n=n, rows=rows, zrow=zrow, off_rate=off_rate,
                  ftab_k=ftab_k, ref_names=ref_names, ref_lens=ref_lens,
                  zrow2=zrow2)
    return FMIndex(
        meta=meta, bwt_words=bwt_words, occ=occ, mark_words=mark_words,
        mark_chk=mark_chk, sa_marked=sa_marked,
        bwt2_words=bwt2_words, occ2=occ2, ftab2_top=ftab2_top,
        ftab_top=ftab_top, ftab_bot=ftab_bot, fchr=fchr, ref_words=ref_words,
        frag_joined=np.concatenate([frag_joined, [np.int32(n)]]).astype(np.int32),
        frag_ref=frag_ref, frag_off=frag_off)
