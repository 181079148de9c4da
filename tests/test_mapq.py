"""MAPQ model versions (--mapq-v; reference unique.h new_mapq:585-597).

V2 (BowtieMapq2, default) is exercised throughout the parity corpora;
these tests pin V1 (BowtieMapq, unique.h:430-510) and V3 (BowtieMapq3
binned tables, unique.h:95-165 + unique.cpp:26-58) against hand-traced
reference arithmetic.
"""

import numpy as np

from hisat2_tpu.align import mapq as mapq_mod


def _arr(*vals):
    return np.array(vals, np.int64)


def test_v3_unique_unexhausted_returns_255():
    # unique.h:123-126: !canMax && !exhausted && !hasSecbest -> 255
    mq = mapq_mod.mapq_v3(_arr(0), _arr(0), [False], _arr(0), _arr(-60))
    assert mq[0] == 255


def test_v3_perfect_tables():
    # exhausted search (so the 255 shortcut is off), perfect best:
    # no secbest -> unp_nosec_perf = 44
    mq = mapq_mod.mapq_v3(_arr(0), _arr(0), [False], _arr(0), _arr(-100),
                          exhausted=np.array([True]))
    assert mq[0] == 44
    # perfect best with secbest: unp_sec_perf[best_bin=0] = 2
    mq = mapq_mod.mapq_v3(_arr(0), _arr(-6), [True], _arr(0), _arr(-100))
    assert mq[0] == 2


def test_v3_binning_matches_reference_formula():
    # scMax=0, scMin=-100 -> span 100; best=-42 -> bdist 42 ->
    # bin round(4.2)=4; secbest=-80 -> diff 38 -> bin round(3.8)=4
    # unp_sec[4][4] = 5 (unique.cpp:47-58 row 4 col 4)
    mq = mapq_mod.mapq_v3(_arr(-42), _arr(-80), [True], _arr(0), _arr(-100))
    assert mq[0] == 5
    # no secbest, exhausted: unp_nosec[4] = 32
    mq = mapq_mod.mapq_v3(_arr(-42), _arr(0), [False], _arr(0), _arr(-100),
                          exhausted=np.array([True]))
    assert mq[0] == 32


def test_v3_paired_always_44():
    mq = mapq_mod.mapq_v3(_arr(-10, 0), _arr(-20, -5), [True, True],
                          _arr(0, 0), _arr(-100, -100), paired=True)
    assert list(mq) == [44, 44]


def test_v1_thresholds():
    # scPer=0, scMin=-100 -> diff=100, sixth_2=-33.32, sixth_3=-49.98
    mq = mapq_mod.mapq_v1(_arr(0), _arr(0), [False], _arr(0), _arr(-100))
    assert mq[0] == 255  # unique shortcut
    ex = np.array([True])
    for best, want in ((-10, 37), (-40, 25), (-60, 10)):
        mq = mapq_mod.mapq_v1(_arr(best), _arr(0), [False], _arr(0),
                              _arr(-100), exhausted=ex)
        assert mq[0] == want, (best, mq[0], want)
    # with secbest: bestdiff tiers 0.1666*k
    for best, sec, want in ((0, -90, 6), (0, -70, 5), (0, -55, 4),
                            (0, -40, 3), (0, -20, 2), (0, -5, 1)):
        mq = mapq_mod.mapq_v1(_arr(best), _arr(sec), [True], _arr(0),
                              _arr(-100))
        assert mq[0] == want, (best, sec, mq[0], want)


def test_selected_dispatch():
    old = mapq_mod.VERSION
    try:
        mapq_mod.VERSION = 3
        mq = mapq_mod.mapq_selected(_arr(-10), _arr(-20), [True], _arr(0),
                                    _arr(-100), paired=True)
        assert mq[0] == 44
        mapq_mod.VERSION = 2
        mq = mapq_mod.mapq_selected(_arr(0), _arr(0), [False], _arr(0),
                                    _arr(-100))
        assert mq[0] == 60
    finally:
        mapq_mod.VERSION = old
