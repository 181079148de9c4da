"""Genotype-genome build parity: committed oracle outputs.

Fixtures in tests/data/genotype/refgg.*: the reference
hisatgenotype_build_genome.py (py3-shimmed; samtools/hisat2-build
shimmed out) run on a hand-crafted 3-gene, 2-chromosome input set with
common variants — generator: tests/data/genotype/make_bg_fixture.py.
Exercises backbone splicing with coordinate shift, hv/ht renumbering,
.index.snp subsetting, link rewriting, .coord segments, and the
common-variant pass-through/drop rules.
"""

import gzip
import os

import numpy as np

DATA = os.path.join(os.path.dirname(__file__), "data", "genotype")
ACGT = np.array(list("ACGT"))


def make_inputs(w, seed=23):
    """Keep in sync with tests/data/genotype/make_bg_fixture.py."""
    rng = np.random.default_rng(seed)
    chr6 = "".join(ACGT[rng.integers(0, 4, 30000)])
    chr7 = "".join(ACGT[rng.integers(0, 4, 12000)])
    with open(f"{w}/genome.fa", "w") as f:
        f.write(">6 fake chr6 fragment\n")
        for s in range(0, len(chr6), 60):
            f.write(chr6[s:s + 60] + "\n")
        f.write(">7 fake chr7 fragment\n")
        for s in range(0, len(chr7), 60):
            f.write(chr7[s:s + 60] + "\n")
    genes = [("A", "6", 5000, 6199, 1250),
             ("B", "6", 9000, 9899, 920),
             ("C", "7", 2000, 2599, 600)]
    with open(f"{w}/hla.locus", "w") as f:
        for g, ch, l, r, blen in genes:  # noqa: E741
            f.write(f"{g}*BACKBONE\t{ch}\t{l}\t{r}\t{blen}"
                    f"\t0-{blen-1}\t+\n")
    bbs = {}
    with open(f"{w}/hla_backbone.fa", "w") as f:
        for g, ch, l, r, blen in genes:  # noqa: E741
            bb = "".join(ACGT[rng.integers(0, 4, blen)])
            bbs[g] = bb
            f.write(f">{g}*BACKBONE\n")
            for s in range(0, blen, 60):
                f.write(bb[s:s + 60] + "\n")
    with open(f"{w}/hla.snp", "w") as fs, \
         open(f"{w}/hla.index.snp", "w") as fi, \
         open(f"{w}/hla.link", "w") as fl, \
         open(f"{w}/hla.haplotype", "w") as fh:
        n = ht = 0
        for g, ch, l, r, blen in genes:  # noqa: E741
            bb = bbs[g]
            ids = []
            for k in range(6):
                pos = 40 + 37 * k
                kind = ("single", "deletion", "insertion")[k % 3]
                if kind == "single":
                    data = "ACGT"[("ACGT".index(bb[pos]) + 1) % 4]
                elif kind == "deletion":
                    data = str(2 + k % 3)
                else:
                    data = "TT"
                fs.write(f"hv{n}\t{kind}\t{g}*BACKBONE\t{pos}\t{data}\n")
                if k != 4:
                    fi.write(f"hv{n}\t{kind}\t{g}*BACKBONE\t{pos}"
                             f"\t{data}\n")
                fl.write(f"hv{n}\t{g}*01:01 {g}*02:01\n")
                ids.append(f"hv{n}")
                n += 1
            fh.write(f"ht{ht}\t{g}*BACKBONE\t40\t120\t"
                     + ",".join(ids[:3]) + "\n")
            ht += 1
            fh.write(f"ht{ht}\t{g}*BACKBONE\t151\t225\t"
                     + ",".join(ids[3:]) + "\n")
            ht += 1
    with open(f"{w}/hla_sequences.fa", "w") as f:
        f.write(">A*01:01\nACGT\n")
    with open(f"{w}/hla.partial", "w") as f:
        f.write("A*77:77\n")
    cv = [("6", 1000, "single", "A"),
          ("6", 5500, "single", "C"),
          ("6", 7000, "deletion", 3),
          ("6", 9100, "single", "G"),
          ("6", 20000, "insertion", "CAT"),
          ("7", 500, "single", "T"),
          ("7", 2100, "single", "A"),
          ("7", 8000, "deletion", 2)]
    with open(f"{w}/snp144Common.snp", "w") as f:
        for i, (ch, pos, kind, data) in enumerate(cv):
            f.write(f"cv{i}\t{kind}\t{ch}\t{pos}\t{data}\n")
    with open(f"{w}/snp144Common.haplotype", "w") as f:
        f.write("ht0\t6\t1000\t1000\tcv0\n")
        f.write("ht1\t6\t7000\t7002\tcv2\n")
        f.write("ht2\t6\t5500\t5500\tcv1\n")
        f.write("ht3\t7\t500\t500\tcv5\n")


def test_build_genome_matches_reference(tmp_path, monkeypatch):
    from hisat2_tpu.genotype.build_genome import build_genotype_genome
    w = str(tmp_path)
    make_inputs(w)
    monkeypatch.chdir(w)
    build_genotype_genome("genome.fa", ["hla"], "gg",
                          commonvar_base="snp144Common")
    for ext in ("fa", "locus", "snp", "index.snp", "haplotype", "link",
                "coord", "clnsig", "partial"):
        got = open(f"{w}/gg.{ext}").read()
        want = gzip.open(f"{DATA}/refgg.{ext}.gz", "rt").read()
        assert got == want, f".{ext} differs from the reference"


def test_genotype_genome_aligns(tmp_path, monkeypatch):
    """End-to-end: the spliced genome + rebased .index.snp/.haplotype
    build a graph index, and a read carrying one of the rebased SNVs
    aligns with the variant forgiven (Zs)."""
    from hisat2_tpu.align.pipeline import TPUAligner
    from hisat2_tpu.genotype.build_genome import (build_genotype_genome,
                                                  read_genome)
    from hisat2_tpu.index.builder import build_fm_index
    from hisat2_tpu.index.variants import attach_variants

    w = str(tmp_path)
    make_inputs(w)
    monkeypatch.chdir(w)
    build_genotype_genome("genome.fa", ["hla"], "gg")
    chr_dic, _, _ = read_genome(open("gg.fa"))
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    g6 = np.asarray([code[c] for c in chr_dic["6"]], np.uint8)
    index = build_fm_index([("6", g6)])
    attach_variants(index, snp_file="gg.index.snp")
    aligner = TPUAligner(index, variants=index._variants)
    # first rebased SNV of gene A: backbone pos 40 -> genome pos 5040
    snp_line = open("gg.index.snp").readline().split()
    pos, alt = int(snp_line[3]), snp_line[4]
    L = 100
    codes = np.asarray([code[c] for c in chr_dic["6"]
                        [pos - 50:pos + 50]])[None, :].copy()
    codes[0, 50] = code[alt]
    res = aligner.align_batch(
        codes.astype(np.int64), np.full((1, L), 40, np.int64),
        np.asarray([L]))
    a = res.alignments[0][0]
    assert a.ref_pos == pos - 50
    assert a.score == 0, "SNV should be forgiven via the rebased .snp"
