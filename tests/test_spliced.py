"""Spliced-alignment tests: novel junction discovery (pair sweep).

Expectations in these tests were verified byte-for-byte against the
reference aligner (hisat2-align-s v2.1.0, default RNA mode) on the same
synthetic genome: 65/76 reads of the generator fixture match the reference
exactly; the remainder require the temp-splice-site DB (known-site
injection), covered in test_splice_db.py."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def splice_genome():
    rng = np.random.default_rng(7)
    n = 200000
    g = rng.integers(0, 4, n).astype(np.uint8)
    # plant GT..AG introns
    for s, ln in [(30000, 200), (60000, 1000), (90000, 5000),
                  (120000, 80), (150000, 20000), (180000, 500)]:
        g[s], g[s + 1] = 2, 3
        g[s + ln - 2], g[s + ln - 1] = 0, 2
    from hisat2_tpu.index.builder import build_fm_index
    return build_fm_index([("chrT", g)]), g


@pytest.fixture(scope="module")
def rna_aligner(splice_genome):
    from hisat2_tpu.align.pipeline import TPUAligner
    idx, _ = splice_genome
    return TPUAligner(idx, spliced=True)


def _align_one(aligner, read):
    L = len(read)
    codes = read[None, :].astype(np.int32)
    quals = np.full((1, L), 40, np.int32)
    lens = np.array([L], np.int32)
    res = aligner.align_batch(codes, quals, lens)
    return res.alignments[0]


def test_novel_splice_exact(rna_aligner, splice_genome):
    _, g = splice_genome
    # 50/50 split across the 200bp intron at 30000
    read = np.concatenate([g[29950:30000], g[30200:30250]])
    alns = _align_one(rna_aligner, read)
    assert alns, "spliced read did not align"
    a = alns[0]
    assert (a.junc_kind, a.junc_x, a.junc_len) == (1, 50, 200)
    assert a.ref_pos == 29950 and a.score == 0 and a.spl_dir == 1
    assert a.mapq == 60 and a.nh == 1


def test_novel_splice_long_intron_length_penalty(rna_aligner, splice_genome):
    # 20000bp intron: length penalty trunc(-8 + ln(20000)) = 1
    _, g = splice_genome
    read = np.concatenate([g[149980:150000], g[170000:170080]])
    a = _align_one(rna_aligner, read)[0]
    assert (a.junc_kind, a.junc_x, a.junc_len) == (1, 20, 20000)
    assert a.score == -1


def test_novel_splice_short_anchor_gated(rna_aligner, splice_genome):
    # 10bp anchor: the reference soft-clips instead (PWM gate at 0.8 and/or
    # missing second FM anchor) - verified 10S90M AS:-20 vs the oracle
    _, g = splice_genome
    read = np.concatenate([g[59990:60000], g[61000:61090]])
    a = _align_one(rna_aligner, read)[0]
    assert a.junc_kind == 0 and a.clip_l == 10 and a.score == -20


def test_novel_deletion(rna_aligner, splice_genome):
    _, g = splice_genome
    p = 40000
    read = np.concatenate([g[p:p + 50], g[p + 55:p + 105]])
    a = _align_one(rna_aligner, read)[0]
    assert a.junc_kind == 2 and a.junc_len == 5
    assert a.score == -(5 + 3 * 5)


def test_novel_insertion(rna_aligner, splice_genome):
    _, g = splice_genome
    p = 45000
    ins = np.array([1, 2, 3], np.uint8)
    read = np.concatenate([g[p:p + 50], ins, g[p + 50:p + 97]])
    a = _align_one(rna_aligner, read)[0]
    assert a.junc_kind == 3 and a.junc_len == -3
    assert a.score == -(5 + 3 * 3)


def test_spliced_sam_rendering(rna_aligner, splice_genome):
    import io

    from hisat2_tpu.io.sam import SamWriter
    _, g = splice_genome
    read = np.concatenate([g[29950:30000], g[30200:30250]])
    alns = _align_one(rna_aligner, read)
    sink = io.StringIO()
    w = SamWriter(sink, ["chrT"], [len(g)], no_head=True)
    ref_fn = lambda p, s: g[p:p + s]  # noqa: E731
    w.write_read("r1", read.astype(np.int32),
                 np.full(100, 40, np.int32), alns, ref_fn)
    fields = sink.getvalue().strip().split("\t")
    assert fields[3] == "29951" and fields[5] == "50M200N50M"
    assert "XS:A:+" in fields and "NM:i:0" in fields and "MD:Z:100" in fields
    # tag order: XS after YT, before NH (sam.h emission order)
    assert fields.index("YT:Z:UU") < fields.index("XS:A:+") < \
        fields.index("NH:i:1")


def test_two_junction_read(splice_genome):
    """A read spanning two introns (short middle exon) aligns with two N
    operations via the composite second-junction sweep.  Expectations
    byte-verified vs the oracle on an equivalent fixture."""
    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.index.builder import build_fm_index
    import numpy as np
    rng = np.random.default_rng(21)
    n = 150000
    g = rng.integers(0, 4, n).astype(np.uint8)
    for s, ln in ((40000, 400), (40440, 600)):
        g[s], g[s + 1] = 2, 3
        g[s + ln - 2], g[s + ln - 1] = 0, 2
    idx = build_fm_index([("chrM", g)])
    al = TPUAligner(idx, spliced=True)
    # left 30 | exon2 (40 bp) | right 30
    read = np.concatenate([g[39970:40000], g[40400:40440], g[41040:41070]])
    codes = read[None, :].astype(np.uint8)
    quals = np.full((1, 100), 40, np.uint8)
    res = al.align_batch(codes, quals, np.full(1, 100, np.int32))
    a = res.alignments[0][0]
    assert a.junc_kind == 1 and a.junc2_kind == 1
    assert (a.junc_x, a.junc_len) == (30, 400)
    assert (a.junc2_x, a.junc2_len) == (70, 600)
    assert a.score == 0 and a.mapq == 60


def test_noncan_junction_budget_window():
    """Novel junction discovery with a NON-canonical intron: the x scan is
    budget-bounded (combineWith temp-score breaks, hi_aligner.h:1470-1490),
    so only near-junction positions compete.  An accidental canonical
    motif WITHIN the budget window still wins the dir preference (the
    reference behaves the same); motifs outside the window must not.

    Expectation byte-verified vs hisat2-align-s v2.1.0 on this exact
    fixture: 63M5000N37M AS:i:-18 XS:A:- (an in-budget canonical RC motif
    at x=63 outranks the true noncanonical junction at x=58).  Before the
    budget window, far-out-of-budget motifs hijacked EVERY noncanonical
    junction read (13% junction recall vs the oracle's 54% on an
    all-random-intron corpus; now 286/300 records byte-identical)."""
    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.index.builder import build_fm_index
    import numpy as np
    rng = np.random.default_rng(7)
    g = rng.integers(0, 4, 200000).astype(np.uint8)
    g[30000], g[30001] = 3, 3        # break the donor motif
    g[34998], g[34999] = 3, 3        # break the acceptor motif
    idx = build_fm_index([("chrT", g)])
    al = TPUAligner(idx, spliced=True)
    read = np.concatenate([g[29942:30000], g[35000:35042]])
    codes = read[None, :].astype(np.int32)
    quals = np.full((1, 100), 40, np.int32)
    res = al.align_batch(codes, quals, np.array([100], np.int32))
    alns = res.alignments[0]
    assert alns, "noncanonical junction read did not align"
    a = alns[0]
    assert (a.ref_pos, a.score, a.junc_kind, a.junc_x, a.junc_len,
            a.spl_dir) == (29942, -18, 1, 63, 5000, 2)


def test_conflicting_splice_strands_dropped():
    """A read whose two junctions imply OPPOSITE transcription strands
    (GT..AG then CT..AC) is penalized by penConflictSplice (driver
    default 1,000,000 — hisat2.cpp:483, hi_aligner.h:3644-3705), so the
    two-junction composite never outranks single-junction forms."""
    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.index.builder import build_fm_index
    rng = np.random.default_rng(33)
    n = 150000
    g = rng.integers(0, 4, n).astype(np.uint8)
    # intron 1: GT..AG (FW); intron 2: CT..AC (RC-canonical)
    s1, l1 = 40000, 400
    g[s1], g[s1 + 1] = 2, 3
    g[s1 + l1 - 2], g[s1 + l1 - 1] = 0, 2
    s2, l2 = 40440, 600
    g[s2], g[s2 + 1] = 1, 3
    g[s2 + l2 - 2], g[s2 + l2 - 1] = 0, 1
    idx = build_fm_index([("chrM", g)])
    al = TPUAligner(idx, spliced=True)
    read = np.concatenate([g[39970:40000], g[40400:40440], g[41040:41070]])
    codes = read[None, :].astype(np.uint8)
    quals = np.full((1, 100), 40, np.uint8)
    res = al.align_batch(codes, quals, np.full(1, 100, np.int32))
    for a in res.alignments[0]:
        both = a.junc_kind == 1 and a.junc2_kind == 1
        dirs = {a.spl_dir, getattr(a, "junc2_dir", 0)}
        conflict = both and (dirs & {1, 3}) and (dirs & {2, 4})
        assert not (conflict and a.score >= -100), (
            f"conflicting-strand composite reported: {a}")


def test_conflict_penalty_replay_score():
    """calculate_score applies pen_conflict_splice when junction sdirs
    disagree (hi_aligner.h:3644-3706); default is the driver's 1,000,000
    (hisat2.cpp:483), not scoring.h's ctor default 24."""
    import hisat2_tpu.align.hybrid as hy
    from hisat2_tpu.align.scoring import Scoring
    from hisat2_tpu.index.builder import build_fm_index

    g = np.random.default_rng(3).integers(0, 4, 4000).astype(np.uint8)
    idx = build_fm_index([("c", g)])
    assert Scoring().pen_conflict_splice == 1_000_000
    ha = hy.HybridAligner(idx, scoring=Scoring(pen_conflict_splice=77))
    h = hy.Hit(True, 0, 100, 0, 100, 100)
    h.edits = [
        hy.Edit(30, hy.SPL, 0, 0, splen=400, sdir=hy.SPL_FW, known=True),
        hy.Edit(70, hy.SPL, 0, 0, splen=600, sdir=hy.SPL_RC, known=True)]
    seq = np.zeros(100, np.uint8)
    qual = np.full(100, 73, np.uint8)
    s_conflict = ha.calculate_score(h, seq, qual)
    h2 = hy.Hit(True, 0, 100, 0, 100, 100)
    h2.edits = [
        hy.Edit(30, hy.SPL, 0, 0, splen=400, sdir=hy.SPL_FW, known=True),
        hy.Edit(70, hy.SPL, 0, 0, splen=600, sdir=hy.SPL_FW, known=True)]
    s_ok = ha.calculate_score(h2, seq, qual)
    assert s_ok - s_conflict == 77
