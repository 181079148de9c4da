"""Spill D2H layout: equivalence with the full layout + overflow fallback.

The packed device step ships 2 dense slots per lane plus S = 2B compacted
spill rows (pipeline._align_device "SPILL D2H layout"); a batch with more
valid non-head slots than S flags overflow and the host re-runs it with
full_out=True.  Both paths must produce identical batch results.
"""

import numpy as np
import pytest


def _cols(res):
    return [np.asarray(c) for c in res.raw["cols"]]


def _full_run(al, codes, quals, lens, rdids):
    minsc = np.array([al.scoring.min_score(int(l)) for l in lens],
                     np.int64)
    rd, qd, h2d = al._pack_h2d(codes, quals, lens, minsc)
    packed = al._dispatch_packed(rd, qd, rdids, True, h2d, full_out=True)
    return al._host_phase(al._merge_shards(packed), codes, quals, lens,
                          minsc)


def test_spill_matches_full(small_index):
    from hisat2_tpu.align.pipeline import TPUAligner
    idx, seq = small_index
    al = TPUAligner(idx, spliced=False)
    rng = np.random.default_rng(7)
    B, L = 48, 80
    starts = rng.integers(0, len(seq) - L, B)
    codes = np.stack([seq[s:s + L] for s in starts]).astype(np.int32)
    # mismatches / partial garbage for clip + multi-candidate coverage
    for i in range(0, B, 3):
        codes[i, rng.integers(5, 75)] = (codes[i, 10] + 1) % 4
    codes[::7, 70:] = rng.integers(0, 4, (len(codes[::7]), 10))
    quals = np.full((B, L), 40, np.int32)
    lens = np.full(B, L, np.int32)
    rdids = np.arange(B, dtype=np.int64)
    res_s = al._run_batch(codes, quals, lens, rdids)     # spill path
    res_f = _full_run(al, codes, quals, lens, rdids)
    assert res_s.n_aligned == res_f.n_aligned
    for a, b in zip(_cols(res_s), _cols(res_f)):
        np.testing.assert_array_equal(a, b)


def test_spill_overflow_falls_back():
    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.index.builder import build_fm_index

    rng = np.random.default_rng(11)
    unit = rng.integers(0, 4, 500).astype(np.uint8)
    parts = []
    # 9 copies: within the max(k, maxSeeds)=10 resolve cap, so every
    # read fills 9 valid slots -> 7 spills/lane >> the S = 2B budget
    for _ in range(9):
        parts.append(unit)
        parts.append(rng.integers(0, 4, 200).astype(np.uint8))
    seq = np.concatenate(parts)
    idx = build_fm_index([("chr_r", seq)])
    al = TPUAligner(idx, spliced=False)
    B, L = 24, 80
    offs = rng.integers(0, 400, B)
    codes = np.stack([unit[o:o + L] for o in offs]).astype(np.int32)
    quals = np.full((B, L), 40, np.int32)
    lens = np.full(B, L, np.int32)
    rdids = np.arange(B, dtype=np.int64)
    res_s = al._run_batch(codes, quals, lens, rdids)     # must fall back
    res_f = _full_run(al, codes, quals, lens, rdids)
    assert res_s.n_aligned == B
    for a, b in zip(_cols(res_s), _cols(res_f)):
        np.testing.assert_array_equal(a, b)
