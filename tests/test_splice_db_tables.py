"""SpliceSiteDB device-table machinery: incremental on-device merge
equivalence, sentinel monotonicity at >2^30 shard positions, and the
vectorized max_intron_in lookup."""
import dataclasses

import numpy as np
import pytest

from hisat2_tpu.align.splice_db import SpliceSiteDB, _SENTINEL
from hisat2_tpu.index.builder import build_fm_index
from hisat2_tpu.index.format import FMMeta


@pytest.fixture(scope="module")
def small_idx():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, 50000).astype(np.uint8)
    return build_fm_index([("c1", g)])


def test_incremental_merge_matches_full_rebuild(small_idx):
    rng = np.random.default_rng(1)
    db1, db2 = SpliceSiteDB(small_idx), SpliceSiteDB(small_idx)
    sites = [(0, int(a), int(a + d)) for a, d in
             zip(rng.integers(100, 49000, 260),
                 rng.integers(60, 400, 260))]
    sites = list(dict.fromkeys(sites))
    n = small_idx.meta.n
    for s in sites[:10]:
        db1.add_novel(*s, 1, rdid=5)
        db2.add_novel(*s, 1, rdid=5)
    db1.device_tables(0, n)
    step = 25
    for wave in range((len(sites) - 10) // step):
        for s in sites[10 + wave * step: 10 + (wave + 1) * step]:
            db1.add_novel(*s, 1, rdid=100 + wave)
            db2.add_novel(*s, 1, rdid=100 + wave)
        t1 = db1.device_tables(0, n)       # incremental (device merge
        #                                    or capacity-growth rebuild)
        db2._tables = {}
        t2 = db2.device_tables(0, n)       # always full rebuild
        for k in t1:
            assert t1[k].shape == t2[k].shape
            assert np.array_equal(np.asarray(t1[k]), np.asarray(t2[k])), \
                (wave, k)
    # rdid lowering (re-discovery by an earlier read) forces a rebuild
    db1.add_novel(*sites[3], 1, rdid=1)
    db2.add_novel(*sites[3], 1, rdid=1)
    t1 = db1.device_tables(0, n)
    db2._tables = {}
    t2 = db2.device_tables(0, n)
    for k in t1:
        assert np.array_equal(np.asarray(t1[k]), np.asarray(t2[k]))


def test_tables_monotonic_beyond_2_30():
    """Positions above 2^30 must still produce sorted arrays (the old
    2^30 sentinel broke monotonicity, corrupting every searchsorted
    site lookup above 1.07 Gbp shard-local)."""
    n = 1_900_000_000
    meta = FMMeta(n=n, rows=n + 1, zrow=0, off_rate=4, ftab_k=10,
                  ref_names=("c1",), ref_lens=(n,))
    fake = dataclasses.make_dataclass(
        "FakeIdx", ["meta", "frag_joined", "frag_ref", "frag_off"])(
        meta, np.array([0, n], np.int64), np.array([0], np.int64),
        np.array([0], np.int64))
    db = SpliceSiteDB(fake)
    db.add_novel(0, 1_500_000_000, 1_500_000_400, 1, rdid=3)
    db.add_novel(0, 900_000_000, 900_000_200, 1, rdid=4)
    t = db.device_tables(0, n)
    kd = np.asarray(t["ss_kd"])
    assert np.all(np.diff(kd.astype(np.int64)) >= 0)
    assert int(_SENTINEL) > 1_500_000_000
    i = int(np.searchsorted(kd, 1_500_000_000))
    assert kd[i] == 1_500_000_000


def test_bucket_searchsorted_matches_dense(small_idx):
    import jax.numpy as jnp
    from hisat2_tpu.ops.splice import table_searchsorted
    rng = np.random.default_rng(7)
    db = SpliceSiteDB(small_idx)
    for a, d in zip(rng.integers(100, 49000, 300),
                    rng.integers(60, 400, 300)):
        db.add_novel(0, int(a), int(a + d), 1, rdid=3)
    n = small_idx.meta.n
    t = db.device_tables(0, n)
    assert "ss_kd_lob" in t                     # buckets attached
    # queries incl. negatives, beyond-text, duplicates-of-key values
    q = np.concatenate([
        rng.integers(-200, n + 200, 5000),
        np.asarray(t["ss_kd"])[:50].astype(np.int64)]).astype(np.int32)
    for tab, lob in (("ss_kd", "ss_kd_lob"), ("ss_ka_s", "ss_ka_lob")):
        got = np.asarray(table_searchsorted(
            t[tab], jnp.asarray(q), t[lob], t["ss_shift"]))
        exp = np.asarray(jnp.searchsorted(t[tab], jnp.asarray(q)))
        np.testing.assert_array_equal(got, exp, err_msg=tab)


def test_max_intron_in_vectorized(small_idx):
    db = SpliceSiteDB(small_idx)
    db.add_novel(0, 1000, 1300, 1, rdid=7)     # intron len 299
    db.add_novel(0, 2000, 2100, 1, rdid=2)     # intron len 99
    db.add_known(0, 3000, 3900, 1)             # intron len 899, file
    # window covering all three, rdid gating
    assert db.max_intron_in(0, 900, 4000, rdid=10) == 899
    assert db.max_intron_in(0, 900, 3000, rdid=10) == 299
    assert db.max_intron_in(0, 900, 3000, rdid=2) == 99
    # strict bounds: site at up itself excluded
    assert db.max_intron_in(0, 1000, 1301, rdid=10) == 0
    assert db.max_intron_in(0, 999, 1301, rdid=10) == 299
    # no sites in window
    assert db.max_intron_in(0, 10000, 20000, rdid=10) == 0
