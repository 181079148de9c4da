"""extract_vars parity: committed oracle outputs.

Fixtures in tests/data/genotype: the reference
hisatgenotype_extract_vars.py (py3-shimmed, with its GRCh38 hisat2 remap
shimmed to a fixed placement) run on a synthetic 24-allele IMGT-style
locus — generator: tests/data/genotype/make_fixture.py.  Two configs:
ref0 = --no-partial --leftshift, ref5 = + --min-var-freq 5.0 (exercises
the index.snp subset, '.'-consensus insertion columns, and freq-excluded
haplotype vars).
"""

import gzip
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data", "genotype")
ACGT = np.array(list("ACGT"))


def make_db(root, seed=11):
    """Same synthetic MSA as the fixture generator (keep in sync with
    tests/data/genotype/make_fixture.py:make_db)."""
    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/msf", exist_ok=True)
    os.makedirs(f"{root}/fasta", exist_ok=True)
    L = 1200
    bb = rng.integers(0, 4, L)
    names, rows = [], []
    for a in range(24):
        seq = ACGT[bb].copy().astype(object)
        for p in rng.choice(L, int(rng.integers(3, 15)), replace=False):
            seq[p] = "ACGT"[(bb[p] + 1 + int(rng.integers(0, 3))) % 4]
        if a % 2 == 1:
            dl = int(rng.integers(1, 7))
            dp = int(rng.integers(50, L - 60))
            for d in range(dl):
                seq[dp + d] = "."
        if a % 5 == 0:
            for d in range(3):
                seq[400 + d] = "."
        names.append(f"A*{a // 8 + 1:02d}:{a % 8 + 1:02d}:01:01")
        rows.append("".join(seq))
    rows = [r[:700] + ("GT" if i == 21 else "..") + r[700:]
            for i, r in enumerate(rows)]
    with open(f"{root}/msf/A_gen.msf", "w") as f:
        f.write("MSF: %d Type: N Jan 1, 2026 Check: 0 ..\n\n" % (L + 2))
        for nm in names:
            f.write(f" Name: {nm} Len: {L+2} Check: 0 Weight: 1.0\n")
        f.write("\n//\n\n")
        for s in range(0, L + 2, 50):
            for i, nm in enumerate(names):
                f.write(f"{nm} {rows[i][s:s+50]}\n")
            f.write("\n")
    with open(f"{root}/fasta/A_gen.fasta", "w") as f:
        for i, nm in enumerate(names):
            seq = rows[i].replace(".", "")
            f.write(f">HLA:HLA{i:05d} {nm} {len(seq)} bp\n")
            for s in range(0, len(seq), 60):
                f.write(seq[s:s + 60] + "\n")
    ref = names[0]
    with open(f"{root}/hla.dat", "w") as f:
        for i, nm in enumerate(names):
            f.write(f"DE   HLA-{nm}, human MHC sequence\n")
            if nm == ref:
                gl = len(rows[i].replace(".", ""))
                third = gl // 3
                f.write(f"FT   exon          {1}..{third}\n")
                f.write(f"FT   exon          {third+51}..{2*third}\n")
            if i == 5:
                f.write(f"DE   HLA-{nm}FAKEPART, partial sequence\n")
    ref_len = len(rows[0].replace(".", ""))
    return ref_len


def canon_haplotypes(text):
    """ht numbering and equal-(begin,end) ordering are arbitrary in the
    reference (py2 set iteration order); compare the canonical content:
    the multiset of (backbone, begin, end, var-id tuple) windows with
    var ids remapped through the .snp file line they point at."""
    rows = []
    for line in text.strip().splitlines():
        _ht, bb, b, e, ids = line.split("\t")
        rows.append((bb, int(b), int(e), ids))
    return sorted(rows)


@pytest.mark.parametrize("cfg,minfreq", [("0", 0.0), ("5", 5.0)])
def test_extract_vars_matches_reference(tmp_path, cfg, minfreq):
    from hisat2_tpu.genotype.vars import extract_vars
    db = str(tmp_path / "HLA")
    ref_len = make_db(db)
    base = str(tmp_path / "hla")
    extract_vars(db, base,
                 locus_map={"A": ("6", 29942470, 29942470 + ref_len,
                                  "+")},
                 min_var_freq=minfreq, leftshift=True)

    def want(name):
        return gzip.open(f"{DATA}/ref{cfg}{name}.gz", "rt").read()

    for ext in (".snp", ".index.snp", ".snp.freq", ".link", ".locus",
                ".partial"):
        got = open(base + ext).read()
        assert got == want(ext), f"{ext} differs from the reference"
    for suffix in ("_backbone.fa", "_sequences.fa"):
        assert open(base + suffix).read() == want(suffix), suffix
    got_h = canon_haplotypes(open(base + ".haplotype").read())
    want_h = canon_haplotypes(want(".haplotype"))
    assert got_h == want_h, ".haplotype windows differ"


def test_reconstruction_roundtrip(tmp_path):
    """Every allele must be reconstructable from backbone + its variant
    keys (the reference's built-in sanity check)."""
    from hisat2_tpu.genotype.vars import (extract_gene_vars, read_msf,
                                          reconstruct)
    db = str(tmp_path / "HLA")
    make_db(db)
    names, seqs = read_msf(f"{db}/msf/A_gen.msf")
    res = extract_gene_vars(names, seqs, next(iter(names)),
                            min_var_freq=5.0, leftshift=True)
    for name, idx in res["names"].items():
        got = reconstruct(res["backbone"],
                          res["allele_vars"].get(name, []))
        assert got == res["seqs"][idx].replace(".", ""), name
