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
    valid = np.asarray(out["u_flags"]) & 1
    assert valid.any()


def test_sharded_matches_single_device(small_index):
    """The sharded step must produce identical candidates to single-device."""
    import jax

    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.parallel import mesh as pmesh

    idx, seq = small_index
    al = TPUAligner(idx, spliced=True)
    rng = np.random.default_rng(3)
    B, L = 16, 60
    starts = rng.integers(0, len(seq) - L, B)
    reads = np.stack([seq[s:s + L] for s in starts]).astype(np.int32)
    quals = np.full((B, L), 40, np.int32)
    lens = np.full(B, L, np.int32)
    minsc = np.full(B, -20, np.int32)
    rdids = np.arange(B, dtype=np.int32)
    ss = al.splice_db.device_tables()

    single = al._fetch_out(
        al._device_step(al.dev, al.params, reads, quals, lens, minsc,
                        rdids, ss))

    m = pmesh.make_mesh(n_dp=8)
    step = pmesh.sharded_align_step(al, m)
    d = pmesh.replicate(m, al.dev)
    params = pmesh.replicate(m, al.params)
    ss_r = pmesh.replicate(m, ss)
    r, q, l, ms, ri = pmesh.shard_batch(m, reads, quals, lens, minsc, rdids)
    sharded, n_cand = step(d, params, r, q, l, ms, ri, ss_r)
    jax.block_until_ready(n_cand)
    # the packed single-device path uses the spill D2H layout: slots are
    # reordered valid-first and invalid-slot payloads are don't-care, so
    # per-slot u_* fields compare as per-lane SETS over the valid slots
    sv = np.asarray(single["u_flags"]) & 1
    hv = np.asarray(sharded["u_flags"]) & 1
    np.testing.assert_array_equal(sv.sum(axis=1), hv.sum(axis=1),
                                  err_msg="valid-count")
    slot_keys = [k for k in single
                 if k.startswith("u_") and single[k].ndim == 2
                 and single[k].shape[1] == sv.shape[1]
                 and k != "u_alt"]
    for lane in range(sv.shape[0]):
        a = {tuple(int(np.asarray(single[k])[lane, j]) for k in slot_keys)
             for j in np.flatnonzero(sv[lane])}
        b = {tuple(int(np.asarray(sharded[k])[lane, j]) for k in slot_keys)
             for j in np.flatnonzero(hv[lane])}
        assert a == b, f"lane {lane} valid-slot sets differ"
    # per-lane (non-slot) fields still compare exactly
    for k in single:
        if k in slot_keys or k == "u_alt" or k.startswith("sp_"):
            continue
        sh = np.asarray(sharded[k])
        sg = np.asarray(single[k])
        if sh.shape != sg.shape:
            continue
        if sh.dtype.kind in "iu":
            sh2 = np.clip(sh, -32768, 32767)
            sh2 = np.where(sh2 == -32768, np.int32(-(2 ** 30)), sh2)
            if np.array_equal(sg, sh) or np.array_equal(sg, sh2) \
                    or np.array_equal(sg, np.clip(sh, -128, 127)):
                continue
        np.testing.assert_array_equal(sg, sh, err_msg=k)
    assert int(np.asarray(n_cand)) == int(sv.sum())


def test_sharded_variants_match_single(tmp_path):
    """Per-shard variant planes: a 2-shard graph index must produce the
    same alignments as the unsharded one (VERDICT round-1 item 4)."""
    import numpy as np

    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.index.builder import build_fm_index
    from hisat2_tpu.index.variants import attach_variants

    rng = np.random.default_rng(21)
    s1 = rng.integers(0, 4, 30000).astype(np.uint8)
    s2 = rng.integers(0, 4, 30000).astype(np.uint8)
    snp = tmp_path / "v.snp"
    lines = []
    for i, chrom in enumerate(("cA", "cB")):
        s = (s1, s2)[i]
        for j, p in enumerate((1000, 7000)):
            alt = (s[p] + 1) % 4
            lines.append(f"rs{i}{j}\tsingle\t{chrom}\t{p}\t" +
                         "ACGT"[alt])
        lines.append(f"rd{i}\tdeletion\t{chrom}\t12000\t3")
        lines.append(f"ri{i}\tinsertion\t{chrom}\t15000\tTTA")
    snp.write_text("\n".join(lines) + "\n")

    single = build_fm_index([("cA", s1), ("cB", s2)])
    attach_variants(single, snp_file=str(snp))
    sharded = build_fm_index([("cA", s1), ("cB", s2)], shard_bp=31000)
    assert len(sharded.shards) == 2
    attach_variants(sharded, snp_file=str(snp))

    B, L = 20, 80
    starts = np.concatenate([
        np.array([960, 6960, 11950, 14950]),
        rng.integers(0, 30000 - L, 6)])
    reads = np.concatenate([
        np.stack([s1[p:p + L] for p in starts]),
        np.stack([s2[p:p + L] for p in starts[:10]])]).astype(np.int64)
    quals = np.full(reads.shape, 40, np.int64)
    lens = np.full(len(reads), L, np.int64)

    a1 = TPUAligner(single, variants=single._variants)
    a2 = TPUAligner(sharded, variants=sharded._variants)
    r1 = a1.align_batch(reads, quals, lens)
    r2 = a2.align_batch(reads, quals, lens)
    al1, al2 = r1.alignments, r2.alignments
    assert sum(map(len, al1)) > 0
    for x, y in zip(al1, al2):
        assert [str(a) for a in x] == [str(a) for a in y]
