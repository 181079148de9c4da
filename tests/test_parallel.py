"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import jax

    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    # all simulated reads must produce at least one valid candidate
    valid = np.asarray(out[-1])
    assert valid.any()


def test_sharded_matches_single_device(small_index):
    """The sharded step must produce identical candidates to single-device."""
    import jax

    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.parallel import mesh as pmesh
    from hisat2_tpu.utils import bitops

    idx, seq = small_index
    al = TPUAligner(idx)
    rng = np.random.default_rng(3)
    B, L = 16, 60
    starts = rng.integers(0, len(seq) - L, B)
    reads = np.stack([seq[s:s + L] for s in starts]).astype(np.int32)
    quals = np.full((B, L), 40, np.int32)
    lens = np.full(B, L, np.int32)

    single = al._device_step(al.dev, al.mm_pen, al.clip_pen,
                             al.snv1_dev, al.snv2_dev, reads, quals, lens)

    m = pmesh.make_mesh(n_dp=8)
    step = pmesh.sharded_align_step(al, m)
    d = pmesh.replicate(m, al.dev)
    mm = pmesh.replicate(m, al.mm_pen)
    cp = pmesh.replicate(m, al.clip_pen)
    s1 = pmesh.replicate(m, al.snv1_dev)
    s2 = pmesh.replicate(m, al.snv2_dev)
    r, q, l = pmesh.shard_batch(m, reads, quals, lens)
    sharded = step(d, mm, cp, s1, s2, r, q, l)
    jax.block_until_ready(sharded)
    for a, b in zip(single, sharded[:-1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # sharded counter == sum of the single-device validity mask (output 6)
    assert int(np.asarray(sharded[-1])) == int(np.asarray(single[6]).sum())
