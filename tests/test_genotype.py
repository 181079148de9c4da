"""HISAT-genotype equivalent: EM typing + diploid calling (reference:
hisatgenotype_modules/hisatgenotype_typing_common.py:908 single_abundance,
hisatgenotype_locus.py typing flow)."""

import numpy as np
import pytest

from hisat2_tpu.genotype.typing import (call_diploid, compatibility_classes,
                                        em_abundance)


def test_em_unique_classes():
    # 60/40 reads uniquely assignable -> abundances recover the mix
    cmpt = {"A*01": 60, "B*01": 40}
    ranked = em_abundance(cmpt, {"A*01": 1000, "B*01": 1000})
    assert ranked[0][0] == "A*01" and abs(ranked[0][1] - 0.6) < 0.01
    assert ranked[1][0] == "B*01" and abs(ranked[1][1] - 0.4) < 0.01


def test_em_shared_class_resolves():
    # shared reads split by the EM toward the allele with unique support
    cmpt = {"A*01": 50, "A*01-A*02": 100, "A*02": 5}
    ranked = em_abundance(cmpt, {"A*01": 1000, "A*02": 1000})
    assert ranked[0][0] == "A*01"
    assert ranked[0][1] > 0.75


def test_select_alleles_drops_noise():
    # a noise allele below a tenth of the max drops (select_alleles)
    cmpt = {"A*01": 200, "A*02": 3}
    ranked = em_abundance(cmpt, {"A*01": 1000, "A*02": 1000})
    assert [a for a, _ in ranked] == ["A*01"]


def test_length_normalization():
    # equal counts, 2x length difference -> the short allele gets 2/3
    cmpt = {"A*01": 100, "A*02": 100}
    ranked = em_abundance(cmpt, {"A*01": 500, "A*02": 1000})
    assert ranked[0][0] == "A*01" and abs(ranked[0][1] - 2 / 3) < 0.01


def test_diploid_call():
    assert call_diploid([("a", 0.6), ("b", 0.4)]) == ["a", "b"]
    assert call_diploid([("a", 0.95), ("b", 0.05)]) == ["a", "a"]


def test_genotype_end_to_end():
    from hisat2_tpu.genotype.driver import main
    import tempfile, os
    rng = np.random.default_rng(42)
    ACGT = np.array(list("ACGT"))
    base = rng.integers(0, 4, 2000)
    alleles = {}
    for i, nm in enumerate(["X*01:01", "X*02:01", "X*03:01"]):
        a = base.copy()
        for p in rng.integers(100, 1900, 6):
            a[p] = (a[p] + 1 + i) % 4
        alleles[nm] = a
    with tempfile.TemporaryDirectory() as td:
        af = os.path.join(td, "a.fa")
        rf = os.path.join(td, "r.fa")
        out = os.path.join(td, "rep.txt")
        with open(af, "w") as f:
            for nm, a in alleles.items():
                f.write(f">{nm}\n" + "".join(ACGT[a]) + "\n")
        with open(rf, "w") as f:
            rid = 0
            for nm in ("X*01:01", "X*02:01"):
                a = alleles[nm]
                for _ in range(120):
                    o = int(rng.integers(0, len(a) - 80))
                    f.write(f">g{rid}\n" + "".join(ACGT[a[o:o+80]]) + "\n")
                    rid += 1
        assert main(["--alleles", af, "-U", rf, "--out", out]) == 0
        rep = open(out).read()
        assert "call: X*01:01 / X*02:01" in rep \
            or "call: X*02:01 / X*01:01" in rep


def test_pair_loglikelihood_li_hla_model():
    """li_hla-style diploid pair ranking: a heterozygous read mix must
    rank the true (A, B) pair above both homozygous pairs."""
    from hisat2_tpu.genotype.typing import pair_loglikelihood
    cmpt = {"A*01": 40, "B*02": 38, "A*01-B*02": 10, "C*03": 2}
    top = pair_loglikelihood(cmpt, top=3)
    assert top[0][0] == "A*01" and top[0][1] == "B*02"
    assert top[0][2] > top[1][2]
    # homozygous truth: all reads on one allele
    top2 = pair_loglikelihood({"A*01": 50, "A*01-B*02": 30}, top=2)
    assert top2[0][:2] == ("A*01", "A*01")


def test_equal_best_class_exceeds_slot_caps():
    """The compatibility class is collected by SA-range resolution, not
    per-placement device slots: a read matching 200 near-identical
    alleles must class ALL of them (round-2 VERDICT item 6 — the old
    k=n_alleles approach capped at 64 device slots)."""
    from hisat2_tpu.align.hostfm import HostFM
    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.genotype.driver import _equal_best_alleles
    from hisat2_tpu.index.builder import build_fm_index

    rng = np.random.default_rng(7)
    base = rng.integers(0, 4, 1500).astype(np.uint8)
    seqs = []
    for i in range(200):
        a = base.copy()
        # variants only OUTSIDE the read window [400, 520)
        p = int(rng.integers(0, 380)) if i % 2 else \
            int(rng.integers(560, 1480))
        a[p] = (a[p] + 1 + i % 3) % 4
        seqs.append((f"Y*{i:03d}", a))
    index = build_fm_index(seqs)
    al = TPUAligner(index, k=16, max_seeds=10 ** 6, spliced=False)
    fm = HostFM(index)
    read = base[400:520]
    res = al.align_batch(read[None, :].astype(np.int64),
                         np.full((1, 120), 40, np.int64),
                         np.array([120], np.int64))
    alns = res.alignments[0]
    assert alns
    best = max(a.score for a in alns)
    cls = set()
    for a in alns:
        if a.score == best:
            cls |= _equal_best_alleles(fm, index, index.meta.ref_names,
                                       al.ref_codes, a, 120)
    assert len(cls) == 200
