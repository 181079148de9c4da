"""Two-haplotype assembly: phased reconstruction of a diploid sample.

The contract mirrors hisatgenotype_locus.py --assembly (guided De Bruijn
over reads + the variant catalog): reads simulated from two known
alleles must assemble into exactly those two allele sequences.
"""

import numpy as np


def test_assembly_recovers_both_alleles():
    from hisat2_tpu.genotype.assembly import assemble

    rng = np.random.default_rng(5)
    L = 2000
    bb = rng.integers(0, 4, L).astype(np.int8)
    # variant catalog: 30 SNVs; het-to-het gaps are kept < read length so
    # every adjacent het pair is co-covered (one phase block; cross-block
    # hap naming is inherently ambiguous, as in the reference's
    # per-contig assembly) by interleaving het and non-het variants
    vpos = 100 + np.cumsum(rng.integers(30, 60, 30))
    valt = ((bb[vpos] + 1 + rng.integers(0, 3, 30)) % 4).astype(np.int8)
    kind = np.array([("het1", "hom", "het2", "none")[i % 4]
                     for i in range(30)])
    a1 = np.flatnonzero((kind == "het1") | (kind == "hom"))
    a2 = np.flatnonzero((kind == "het2") | (kind == "hom"))
    hap1, hap2 = bb.copy(), bb.copy()
    hap1[vpos[a1]] = valt[a1]
    hap2[vpos[a2]] = valt[a2]

    aligned = []
    for h, tag, n in ((hap1, "h1", 200), (hap2, "h2", 140)):
        for i in range(n):
            st = int(rng.integers(0, L - 150))
            aligned.append((f"{tag}_{i}", st, h[st:st + 150]))
    rng.shuffle(aligned)

    haps, assign, cov = assemble(bb, vpos, valt, aligned)
    got = {h.tobytes() for h in haps}
    assert hap1.tobytes() in got, "haplotype 1 not recovered"
    assert hap2.tobytes() in got, "haplotype 2 not recovered"
    # phasing must separate the two read groups cleanly (het-blind reads
    # are marked -1 and excluded: they carry no phase information)
    labels = np.array([nm.split("_")[0] == "h1" for nm, _, _ in aligned])
    inf = assign >= 0
    ref_grp = assign[inf & labels][0]
    same = assign[inf] == ref_grp
    agree = (same == labels[inf]).mean()
    assert agree > 0.98 or (1 - agree) > 0.98


def test_homozygous_sample_single_group():
    from hisat2_tpu.genotype.assembly import assemble

    rng = np.random.default_rng(6)
    L = 1000
    bb = rng.integers(0, 4, L).astype(np.int8)
    vpos = np.sort(rng.choice(L, 10, replace=False))
    valt = ((bb[vpos] + 1) % 4).astype(np.int8)
    hap = bb.copy()
    hap[vpos[:5]] = valt[:5]
    aligned = [(f"r{i}", int(rng.integers(0, L - 150)), None)
               for i in range(100)]
    aligned = [(nm, st, hap[st:st + 150]) for nm, st, _ in aligned]
    haps, assign, _cov = assemble(bb, vpos, valt, aligned)
    assert haps[0].tobytes() == hap.tobytes()
