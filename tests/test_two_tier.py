"""Two-tier (lite fast pass + full fallback) equivalence tests.

The lite tier-A pass must be output-invisible: align_batch through the
two-pass pipeline (dispatch lite -> route -> full pass on the routed
subset) must produce byte-identical raw rows to a forced single full
pass, on corpora exercising SNVs, indels, multimaps, errors, and
(spliced) temp-site accumulation across batches."""

import numpy as np


def _raw_equal(r1, r2):
    c1 = [np.asarray(c) for c in r1.raw["cols"]]
    c2 = [np.asarray(c) for c in r2.raw["cols"]]
    return len(c1[0]) == len(c2[0]) and all(
        np.array_equal(a, b) for a, b in zip(c1, c2))


def test_two_tier_graph_dna(tmp_path):
    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.index.builder import build_fm_index
    from hisat2_tpu.index.variants import attach_variants

    rng = np.random.default_rng(5)
    N = 30000
    g = rng.integers(0, 4, N).astype(np.uint8)
    blk = g[1000:1300].copy()          # 3-copy repeat (multimaps)
    g[5000:5300] = blk
    g[9000:9300] = blk
    ACGT = "ACGT"
    lines = []
    for k, p in enumerate(sorted(rng.choice(
            np.arange(2000, 28000), 40, replace=False))):
        p = int(p)
        t = k % 3
        if t == 0:
            lines.append(f"rs{k}\tsingle\tc1\t{p}\t"
                         + ACGT[(int(g[p]) + 1) % 4])
        elif t == 1:
            lines.append(f"rs{k}\tdeletion\tc1\t{p}\t"
                         f"{int(rng.integers(1, 4))}")
        else:
            ins = "".join(ACGT[c] for c in rng.integers(
                0, 4, int(rng.integers(1, 4))))
            lines.append(f"rs{k}\tinsertion\tc1\t{p}\t{ins}")
    snp = tmp_path / "v.snp"
    snp.write_text("\n".join(lines) + "\n")
    index = build_fm_index([("c1", g)])
    attach_variants(index, snp_file=str(snp))

    B, L = 256, 100
    starts = rng.integers(0, N - L - 50, B)
    codes = np.stack([g[s:s + L] for s in starts]).astype(np.int64)
    for i in range(B):
        ne = int(rng.integers(0, 4)) if i % 3 == 0 else 0
        for p in rng.choice(L, ne, replace=False):
            codes[i, p] = (codes[i, p] + 1 + int(rng.integers(0, 3))) % 4
    for i in range(0, B, 5):            # some reverse-complement reads
        codes[i] = np.where(codes[i] < 4, 3 - codes[i], 4)[::-1]
    quals = np.full((B, L), 40, np.int64)
    lens = np.full(B, L, np.int64)

    a2p = TPUAligner(index, variants=index._variants, lane_meta=True,
                     k=10)
    assert a2p._fast is not None and a2p._fast.lite
    afull = TPUAligner(index, variants=index._variants, lane_meta=True,
                       k=10)
    afull._fast = None
    r1 = a2p.align_batch(codes, quals, lens)
    r2 = afull.align_batch(codes, quals, lens)
    assert _raw_equal(r1, r2)
    for k in r2.lanes or {}:
        if hasattr(r2.lanes[k], "shape"):
            assert np.array_equal(np.asarray(r1.lanes[k]),
                                  np.asarray(r2.lanes[k])), k


def test_two_tier_spliced_temp_sites():
    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.index.builder import build_fm_index

    rng = np.random.default_rng(17)
    N = 40000
    g = rng.integers(0, 4, N).astype(np.uint8)
    introns = []
    for p in range(3000, 36000, 4000):
        ilen = int(rng.integers(80, 400))
        g[p:p + 2] = [2, 3]                     # GT
        g[p + ilen - 2:p + ilen] = [0, 2]       # AG
        introns.append((p, ilen))
    index = build_fm_index([("c1", g)])
    B, L = 192, 100
    codes = np.zeros((B, L), np.int64)
    for i in range(B):
        if i % 3 == 0:
            p, ilen = introns[int(rng.integers(0, len(introns)))]
            lexon = int(rng.integers(25, 75))
            codes[i] = np.concatenate(
                [g[p - lexon:p], g[p + ilen:p + ilen + (L - lexon)]])
        else:
            s = int(rng.integers(0, N - L - 500))
            read = g[s:s + L].copy()
            if i % 5 == 0:
                for q in rng.choice(L, int(rng.integers(0, 3)),
                                    replace=False):
                    read[q] = (read[q] + 1 + int(rng.integers(0, 3))) % 4
            codes[i] = read
    quals = np.full((B, L), 40, np.int64)
    lens = np.full(B, L, np.int64)

    def run(two_pass):
        al = TPUAligner(index, spliced=True, lane_meta=True)
        if not two_pass:
            al._fast = None
        outs = []
        # 3 sequential batches: batch 2-3 exercise pass-1 known-site
        # injection from batch-1 discoveries + the ver-delta boundary
        # re-route
        for b in range(3):
            rdids = np.arange(B, dtype=np.int64) + b * B
            res = al.align_batch(codes, quals, lens, rdids)
            outs.append(res)
        return outs, al.splice_db

    o1, db1 = run(True)
    o2, db2 = run(False)
    assert set(db1.sites) == set(db2.sites)
    for b in range(3):
        assert _raw_equal(o1[b], o2[b]), f"batch {b} diverged"
