"""Mate rescue (alignMate equivalent): anchored window search.

Expectations verified byte-for-byte against hisat2-align-s on the same
fixture (repetitive mate whose SA hits exceed the row cap, unique partner)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rescue_setup():
    from hisat2_tpu.index.builder import build_fm_index
    rng = np.random.default_rng(5)
    n = 300000
    g = rng.integers(0, 4, n).astype(np.uint8)
    unit = rng.integers(0, 4, 120).astype(np.uint8)
    spots = [20000 + 18000 * i for i in range(15)]
    for s in spots:
        g[s:s + 120] = unit
    return build_fm_index([("chrP", g)]), g, spots


def test_repetitive_mate_rescued(rescue_setup):
    from hisat2_tpu.align.pipeline import TPUAligner
    idx, g, spots = rescue_setup
    al = TPUAligner(idx)
    s = spots[0]
    m2 = g[s + 10:s + 110].astype(np.uint8)   # inside the repeat (15 copies)
    codes = m2[None, :].astype(np.uint8)
    quals = np.full((1, 100), 40, np.uint8)
    lens = np.full(1, 100, np.int32)
    # unanchored: the repeat hit exceeds the getAnchorHits row cap
    res = al.align_batch(codes, quals, lens)
    assert not res.alignments[0], "repeat mate should not align unanchored"
    # anchored rescue at the partner's position finds it
    recs = al.rescue_mates(codes, quals, lens,
                           np.array([s - 250]), np.array([False]),
                           maxins=500)
    assert recs[0], "rescue found nothing"
    best = recs[0][0]
    assert best.joined_pos == s + 10 and best.score == 0
    # other in-window copies surface as equal secbest (ZS)
    assert best.zs == 0
