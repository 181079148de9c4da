"""End-to-end genotype driver flow (hisatgenotype.py equivalent):
align -> per-locus extract -> MSA typing -> unified report.

Reference flow: /root/reference/hisatgenotype.py:34-170 +
hisatgenotype_locus.py typing.  The fixture plants a diploid allele
mixture; the report must rank the two planted alleles on top.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ACGT = np.array(list("ACGT"))


@pytest.fixture(scope="module")
def geno_fixture(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("geno"))
    rng = np.random.default_rng(515)
    # host genome: 30 kb chromosome; locus backbone replaces [10k, 12k)
    chrom = rng.integers(0, 4, 30000)
    backbone = chrom[10000:12000].copy()
    msa = []
    for a in range(20):
        seq = backbone.copy()
        for p in rng.choice(2000, 6, replace=False):
            seq[p] = (seq[p] + 1 + rng.integers(0, 3)) % 4
        msa.append((f"HL*{a + 1:02d}:01", "".join(ACGT[seq])))
    with open(f"{d}/HL.msa.fa", "w") as f:
        for nm, s in msa:
            f.write(f">{nm}\n{s}\n")
    # genotype genome: backbone spliced in place (same length here)
    with open(f"{d}/gg.fa", "w") as f:
        s = "".join(ACGT[chrom])
        f.write(">chr1\n" + s + "\n")
    with open(f"{d}/gg.locus", "w") as f:
        f.write("HLA\tHL*01:01\tchr1\t10000\t11999\t10000-11999\t+\n")
    # reads: diploid 2:1 mix of alleles 4 and 11 + background reads
    reads = []
    i = 0
    for rep, n in ((4, 120), (11, 60)):
        s = msa[rep][1]
        for _ in range(n):
            st = int(rng.integers(0, 2000 - 150))
            reads.append((f"r{i}", s[st:st + 150]))
            i += 1
    bg = "".join(ACGT[chrom])
    for _ in range(80):
        st = int(rng.integers(0, 9800))
        reads.append((f"b{i}", bg[st:st + 150]))
        i += 1
    with open(f"{d}/reads.fa", "w") as f:
        for nm, sq in reads:
            f.write(f">{nm}\n{sq}\n")
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "hisat2_tpu", "build", f"{d}/gg.fa",
         f"{d}/ggidx"], check=True, env=env, capture_output=True)
    return d


def test_run_flow_report(geno_fixture):
    d = geno_fixture
    from hisat2_tpu.genotype.driver import build_parser, run_genotype_full
    args = build_parser().parse_args(
        ["--run", f"{d}/gg", "--index", f"{d}/ggidx",
         "--msa-dir", d, "-U", f"{d}/reads.fa",
         "--out", f"{d}/report.txt"])
    assert run_genotype_full(args) == 0
    rep = open(f"{d}/report.txt").read()
    # locus header with extraction count
    assert "HLA HL" in rep
    lines = [ln for ln in rep.splitlines() if "ranked" in ln]
    assert len(lines) >= 2
    # planted alleles HL*05:01 (idx 4) and HL*12:01 (idx 11) on top
    top2 = " ".join(lines[:2])
    assert "HL*05:01" in top2 and "HL*12:01" in top2, rep
    # background reads must not reach the locus bucket
    first = [ln for ln in rep.splitlines() if ln.startswith("HLA")][0]
    n_extract = int(first.split(":")[-1].split()[0])
    assert 150 <= n_extract <= 185


def test_lihla_checker_agrees_with_typing(geno_fixture, tmp_path):
    """The standalone li_hla-model checker (genotype/lihla.py), fed a
    backbone SAM of the fixture reads, ranks the planted diploid pair
    on top — agreeing with the MSA-typing report."""
    import subprocess
    d = geno_fixture
    t = str(tmp_path)
    # derive PREFIX.snp/.link/_backbone.fa from the fixture MSA
    msa = {}
    for line in open(f"{d}/HL.msa.fa"):
        if line.startswith(">"):
            nm = line[1:].strip()
            msa[nm] = ""
        else:
            msa[nm] += line.strip()
    names = list(msa)
    import numpy as np
    rows = np.array([list(s) for s in msa.values()])
    bb = []
    for col in rows.T:
        vals, counts = np.unique(col, return_counts=True)
        bb.append(vals[counts.argmax()])
    bb = "".join(bb)
    with open(f"{t}/HL_backbone.fa", "w") as f:
        f.write(">HL*BACKBONE\n" + bb + "\n")
    snp_lines, link_lines = [], {}
    vid = 0
    for ci in range(len(bb)):
        col = rows[:, ci]
        for alt in sorted(set(col) - {bb[ci]}):
            sid = f"hv{vid}"
            vid += 1
            snp_lines.append(f"{sid}\tsingle\tHL*BACKBONE\t{ci}\t{alt}")
            carriers = [names[i] for i in range(len(names))
                        if col[i] == alt]
            link_lines[sid] = carriers
    with open(f"{t}/HL.snp", "w") as f:
        f.write("\n".join(snp_lines) + "\n")
    with open(f"{t}/HL.link", "w") as f:
        for sid, carriers in link_lines.items():
            f.write(f"{sid}\t{' '.join(carriers)}\n")
    # align the locus reads to the backbone with catalog SNVs (Zs tags)
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "hisat2_tpu", "build",
         f"{t}/HL_backbone.fa", f"{t}/bbidx", "--snp", f"{t}/HL.snp"],
        check=True, env=env, capture_output=True)
    subprocess.run(
        [sys.executable, "-m", "hisat2_tpu", "align", "-x", f"{t}/bbidx",
         "-f", "-U", f"{d}/reads.fa", "--no-spliced-alignment",
         "--no-unal", "-S", f"{t}/bb.sam"],
        check=True, env=env, capture_output=True)
    from hisat2_tpu.genotype.lihla import rank_pairs
    ranked = rank_pairs(f"{t}/HL", f"{t}/bb.sam",
                        backbone="HL*BACKBONE")
    assert ranked, "no pairs ranked"
    top = {ranked[0][0], ranked[0][1]}
    assert top == {"HL*05:01", "HL*12:01"}, ranked[:3]
