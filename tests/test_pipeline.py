"""End-to-end alignment on simulated reads from a known genome."""

import numpy as np
import pytest

from hisat2_tpu.align.pipeline import TPUAligner
from hisat2_tpu.utils import bitops


def simulate_reads(seq, n, length, rng, mismatches=0, rc_half=True):
    starts = rng.integers(0, len(seq) - length, n)
    reads = np.stack([seq[s:s + length].copy() for s in starts])
    is_rc = np.zeros(n, bool)
    for i in range(n):
        for _ in range(mismatches):
            p = rng.integers(0, length)
            reads[i, p] = (reads[i, p] + rng.integers(1, 4)) % 4
        if rc_half and i % 2 == 1:
            reads[i] = bitops.revcomp_codes(reads[i])
            is_rc[i] = True
    return reads, starts, is_rc


@pytest.fixture(scope="module")
def aligner(small_index):
    idx, _ = small_index
    return TPUAligner(idx)


def test_exact_reads_align(small_index, aligner, rng):
    idx, seq = small_index
    reads, starts, is_rc = simulate_reads(seq, 32, 60, rng)
    lens = np.full(32, 60, np.int32)
    quals = np.full((32, 60), 40, np.uint8)
    res = aligner.align_batch(reads, quals, lens)
    assert res.n_reads == 32
    for i in range(32):
        alns = res.alignments[i]
        assert alns, f"read {i} unaligned"
        best = alns[0]
        assert best.score == 0
        hit_positions = [a.joined_pos for a in alns]
        assert int(starts[i]) in hit_positions
        match = [a for a in alns if a.joined_pos == int(starts[i])]
        assert match[0].rc == bool(is_rc[i])


def test_mismatched_reads_align(small_index, aligner, rng):
    idx, seq = small_index
    n, L = 24, 80
    reads, starts, is_rc = simulate_reads(seq, n, L, rng, mismatches=2)
    lens = np.full(n, L, np.int32)
    quals = np.full((n, L), 40, np.uint8)
    res = aligner.align_batch(reads, quals, lens)
    found = sum(
        1 for i in range(n)
        if any(a.joined_pos == int(starts[i]) for a in res.alignments[i]))
    # 2 mismatches in 80bp: both anchors >=16bp exist with high probability
    assert found >= n - 2
    for i in range(n):
        for a in res.alignments[i]:
            if a.joined_pos == int(starts[i]):
                assert a.n_mm <= 2
                assert a.score >= -12


def test_unalignable_read(small_index, aligner):
    idx, seq = small_index
    # a read unlikely to exist: alternating pattern not in random genome
    rng2 = np.random.default_rng(5)
    while True:
        rd = rng2.integers(0, 4, 70).astype(np.uint8)
        s = bitops.decode_dna(rd)
        if bitops.decode_dna(seq).find(s[:20]) < 0:
            break
    # inject mismatches everywhere so score < min
    rd2 = (rd + 1) % 4
    reads = np.stack([rd * 0 + rd2])
    res = aligner.align_batch(
        reads, np.full((1, 70), 40, np.uint8), np.full(1, 70, np.int32))
    # either unaligned or score passes threshold — must not crash; and any
    # reported alignment must satisfy min score
    for a in res.alignments[0]:
        assert a.score >= -14


def test_n_in_read(small_index, aligner, rng):
    idx, seq = small_index
    L = 60
    s = int(rng.integers(0, len(seq) - L))
    rd = seq[s:s + L].copy()
    rd[30] = 4  # N
    res = aligner.align_batch(
        rd[None], np.full((1, L), 40, np.uint8), np.full(1, L, np.int32))
    alns = res.alignments[0]
    assert alns
    a = [x for x in alns if x.joined_pos == s][0]
    assert a.n_n == 1
    assert a.score == -1  # np penalty


def test_multimapping_nh(rng):
    """A read from a repeated region reports multiple alignments with NH."""
    from hisat2_tpu.index.builder import build_fm_index
    unit = rng.integers(0, 4, 500).astype(np.uint8)
    genome = np.concatenate([unit, rng.integers(0, 4, 300).astype(np.uint8),
                             unit])
    idx = build_fm_index([("rep", genome)])
    al = TPUAligner(idx)
    rd = unit[100:180]
    res = al.align_batch(rd[None].astype(np.uint8),
                         np.full((1, 80), 40, np.uint8),
                         np.full(1, 80, np.int32))
    alns = res.alignments[0]
    assert len(alns) == 2
    assert {a.joined_pos for a in alns} == {100, 900}
    assert alns[0].nh == 2
    assert not alns[0].secondary and alns[1].secondary
    assert alns[0].mapq < 60  # equal secbest -> not unique


def test_sampled_sa_matches_full_sa(small_index, rng):
    # off_rate=4 routes candidate resolution through the sparse
    # live-compacted LF walk (ops/resolve.resolve_rows_sparse); the
    # alignment set must be identical to the full-SA index's
    from hisat2_tpu.index.builder import build_fm_index
    idx0, seq = small_index
    idx4 = build_fm_index([("chr_t", seq)], off_rate=4)
    assert idx4.meta.off_rate == 4
    n, L = 48, 72
    reads, starts, is_rc = simulate_reads(seq, n, L, rng, mismatches=1)
    lens = np.full(n, L, np.int32)
    quals = np.full((n, L), 40, np.uint8)
    r0 = TPUAligner(idx0).align_batch(reads, quals, lens)
    r4 = TPUAligner(idx4).align_batch(reads, quals, lens)
    for i in range(n):
        a0 = sorted((a.joined_pos, a.score, a.rc) for a in r0.alignments[i])
        a4 = sorted((a.joined_pos, a.score, a.rc) for a in r4.alignments[i])
        assert a0 == a4, f"read {i}: {a0} != {a4}"


def test_uniform_len_fast_path_matches_general(small_index):
    """The static uniform-length clip optimization must be bit-identical
    to the general per-lane gather path."""
    import numpy as np

    from hisat2_tpu.align.pipeline import TPUAligner

    idx, seq = small_index
    al = TPUAligner(idx)
    rng = np.random.default_rng(7)
    B, L = 12, 80
    starts = rng.integers(0, len(seq) - L, B)
    reads = np.stack([seq[s:s + L] for s in starts]).astype(np.uint8)
    # plant mismatches near the edges to exercise clipping
    reads[0, :4] = (reads[0, :4] + 1) % 4
    reads[1, -5:] = (reads[1, -5:] + 2) % 4
    quals = np.full((B, L), 40, np.uint8)
    lens = np.full(B, L, np.int32)
    minsc = np.full(B, -40, np.int32)
    a = al._fetch_out(al._device_step(
        al.dev, al.params, reads, quals, lens, minsc, uniform=True))
    b = al._fetch_out(al._device_step(
        al.dev, al.params, reads, quals, lens, minsc, uniform=False))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_align_oom_recovery():
    """--passMemExc-style align-side recovery: a device OOM on a batch
    retries as two halves with merged, read-index-rebased raw rows."""
    import numpy as np

    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.index.builder import build_fm_index

    rng = np.random.default_rng(1)
    g = rng.integers(0, 4, 100000).astype(np.int8)
    idx = build_fm_index([("c", g)])
    al = TPUAligner(idx)
    codes = np.stack([g[o:o + 100]
                      for o in rng.integers(0, 99000, 64)]).astype(np.int64)
    quals = np.full((64, 100), 40, np.int64)
    lens = np.full(64, 100, np.int64)
    full = al.align_batch(codes, quals, lens)
    orig = al.collect
    state = {"fail": True}

    def failing(handle, paired=False):
        if state["fail"] and len(handle[1]) == 64:
            state["fail"] = False
            raise RuntimeError("RESOURCE_EXHAUSTED (simulated)")
        return orig(handle, paired=paired)

    al.collect = failing
    rec = al.align_batch(codes, quals, lens)
    assert all(
        [(a.ref_pos, a.score) for a in x] == [(a.ref_pos, a.score)
                                              for a in y]
        for x, y in zip(full.alignments, rec.alignments))
