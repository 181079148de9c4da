"""Variant-set genotype typing on a synthetic HLA-like locus.

Builds a 3 kb backbone with 40 alleles (2-12 private/shared SNVs each),
simulates reads from two alleles at 2:1 abundance, and requires the
typing report to rank exactly those two alleles on top — the
hisatgenotype_locus.py contract (top ranking + diploid call), scaled by
variant sets instead of per-allele alignment slots.
"""

import subprocess
import sys
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_msa_typing(tmp_path):
    rng = np.random.default_rng(17)
    ACGT = np.array(list("ACGT"))
    L = 3000
    bb = rng.integers(0, 4, L)
    n_alleles = 40
    msa = []
    allele_snvs = {}
    for a in range(n_alleles):
        seq = bb.copy()
        k = int(rng.integers(2, 13))
        pos = rng.choice(L, k, replace=False)
        for p in pos:
            seq[p] = (seq[p] + 1 + rng.integers(0, 3)) % 4
        name = f"X*{a // 10 + 1:02d}:{a % 10 + 1:02d}"
        allele_snvs[name] = {(int(p), int(seq[p])) for p in pos}
        msa.append((name, "".join(ACGT[seq])))
    with open(tmp_path / "locus.msa.fa", "w") as f:
        for nm, s in msa:
            f.write(f">{nm}\n{s}\n")
    # reads from alleles 3 (2x) and 27 (1x)
    picks = [3, 3, 27]
    seqs = [np.array([c for c in s]) for _, s in msa]
    with open(tmp_path / "reads.fa", "w") as f:
        i = 0
        for rep in picks:
            s = msa[rep][1]
            # 300/pick: even the worst-covered variant site sees ~8+
            # reads from the minor allele, enough for het calling
            for _ in range(300):
                st = int(rng.integers(0, L - 150))
                f.write(f">r{i}\n{s[st:st + 150]}\n")
                i += 1
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-m", "hisat2_tpu", "genotype",
         "--msa", str(tmp_path / "locus.msa.fa"),
         "-U", str(tmp_path / "reads.fa"),
         "--out", str(tmp_path / "report.txt"),
         "--assembly", "--out-base", str(tmp_path / "asm")],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = open(tmp_path / "report.txt").read()
    lines = [l for l in rep.splitlines() if "ranked" in l]
    assert lines, rep
    top2 = [l.split("ranked ")[1].split(" ")[0] for l in lines[:2]]
    assert set(top2) == {msa[3][0], msa[27][0]}, rep
    # abundances roughly 2:1
    import re
    ab = {l.split("ranked ")[1].split(" ")[0]:
          float(re.search(r"([\d.]+)%", l).group(1)) for l in lines[:2]}
    assert ab[msa[3][0]] > ab[msa[27][0]]
    assert "call:" in rep
    # --assembly: the two phased haplotypes must match the two source
    # alleles away from the low-coverage read-length edges
    fa = open(tmp_path / "asm.assembly.fa").read().splitlines()
    haps = {fa[1][150:L - 150], fa[3][150:L - 150]}
    want = {msa[3][1][150:L - 150], msa[27][1][150:L - 150]}
    assert haps == want
