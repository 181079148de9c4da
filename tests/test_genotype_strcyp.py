"""CODIS STR conversion + CYP variant-table extraction tests
(genotype/strloci.py, genotype/cypvar.py) and an end-to-end STR typing
fixture through the --msa variant-set typing path."""

import numpy as np
import pytest

from hisat2_tpu.genotype import cypvar, strloci

# A D21S11-like interleaved structure exercises unit alternation and
# literal spacers (NIST STRBase bracket notation)
STR_ALLELES = [
    ("28", "[TCTA]4[TCTG]6[TCTA]3TA[TCTA]3TCA[TCTA]2TCCATA[TCTA]10"),
    ("29", "[TCTA]4[TCTG]6[TCTA]3TA[TCTA]3TCA[TCTA]2TCCATA[TCTA]11"),
    ("30", "[TCTA]5[TCTG]6[TCTA]3TA[TCTA]3TCA[TCTA]2TCCATA[TCTA]11"),
    ("30.2", "[TCTA]4[TCTG]6[TCTA]3TA[TCTA]3TCA[TCTA]2TCCATA[TCTA]12"),
]


def test_parse_structure_roundtrip():
    segs = strloci.parse_structure(STR_ALLELES[0][1])
    assert strloci.expand(segs) == (
        "TCTA" * 4 + "TCTG" * 6 + "TCTA" * 3 + "TA" + "TCTA" * 3
        + "TCA" + "TCTA" * 2 + "TCCATA" + "TCTA" * 10)
    with pytest.raises(ValueError):
        strloci.parse_structure("[TCTA]0")


def test_convert_str_locus_msa_valid():
    names, rows = strloci.convert_str_locus(STR_ALLELES,
                                            left_flank="GGGG",
                                            right_flank="CCCC")
    assert names == [a for a, _ in STR_ALLELES]
    L = len(rows[0])
    assert all(len(r) == L for r in rows)
    for (aid, st), row in zip(STR_ALLELES, rows):
        core = row[4:-4]
        assert core.replace("-", "") == strloci.expand(
            strloci.parse_structure(st))
        assert row.startswith("GGGG") and row.endswith("CCCC")


def test_convert_str_drops_duplicate_sequences():
    recs = STR_ALLELES + [("dup29", STR_ALLELES[1][1])]
    names, rows = strloci.convert_str_locus(recs)
    assert "dup29" not in names


CYP_REF = "ACGTACGTACGTACGTACGT"          # 20 bp; +1 at index 5
OFF_POS, OFF_NEG = 4, 5                   # +1 -> 5, -1 -> 4


def test_cyp_parse_var():
    assert cypvar.parse_var("-2A>C") == ("S", -2, "A", "C")
    assert cypvar.parse_var("7G>T") == ("S", 7, "G", "T")
    assert cypvar.parse_var("3_4delTA") == ("D", 3, "TA")
    assert cypvar.parse_var("9delC") == ("D", 9, "C")
    # insertion position is the SECOND coordinate (build_msa inserts
    # before it; the reference makeIns inserts between a and b)
    assert cypvar.parse_var("2_3insGG") == ("I", 3, "GG")
    assert cypvar.parse_var("5insT") == ("I", 6, "T")
    assert cypvar.parse_var("-1_1insC") == ("I", 1, "C")
    assert cypvar.parse_var("None") is None
    with pytest.raises(ValueError):
        cypvar.parse_var("whatever")


def test_cyp_build_msa_ops():
    # gene numbering: -1 at index 4, +1 at index 5
    table = {
        "*2": [("S", 1, "C", "G")],            # index 5 C>G
        "*3": [("S", -1, "A", "T")],           # index 4 A>T
        "*4": [("D", 2, "GT")],                # index 6..7 deleted
        "*5": [("I", 3, "AA")],                # ins between +2 and +3
    }
    names, rows = cypvar.build_msa(CYP_REF, table, OFF_POS, OFF_NEG)
    by = dict(zip(names, rows))
    ref_row = by["REF"]
    assert ref_row.replace("-", "") == CYP_REF
    assert by["*2"].replace("-", "") == \
        CYP_REF[:5] + "G" + CYP_REF[6:]
    assert by["*3"].replace("-", "") == \
        CYP_REF[:4] + "T" + CYP_REF[5:]
    assert by["*4"].replace("-", "") == CYP_REF[:6] + CYP_REF[8:]
    assert by["*5"].replace("-", "") == CYP_REF[:7] + "AA" + CYP_REF[7:]
    # insertion-augmented columns: every row same length
    assert len(set(len(r) for r in rows)) == 1


def test_cyp_parse_to_msa_insertion_position():
    # regression (round-5 advice): parsed `2_3insAA` must land between
    # +2 and +3 in the built MSA, not between +1 and +2
    table = cypvar.parse_var_table(["*9\t2_3insAA"])
    names, rows = cypvar.build_msa(CYP_REF, table, OFF_POS, OFF_NEG)
    by = dict(zip(names, rows))
    assert by["*9"].replace("-", "") == CYP_REF[:7] + "AA" + CYP_REF[7:]


def test_cyp_reference_base_check():
    with pytest.raises(ValueError):
        cypvar.build_msa(CYP_REF, {"*x": [("S", 1, "T", "G")]},
                         OFF_POS, OFF_NEG)


def test_str_typing_end_to_end(tmp_path):
    """Simulated diploid STR reads type back to the correct alleles
    through the --msa variant-set path (hisatgenotype_locus model)."""
    rng = np.random.default_rng(5)
    flank_l = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    flank_r = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    names, rows = strloci.convert_str_locus(
        STR_ALLELES, left_flank=flank_l, right_flank=flank_r)
    msa = tmp_path / "locus.msa.fa"
    with open(msa, "w") as f:
        for nm, row in zip(names, rows):
            f.write(f">STR*{nm}\n{row}\n")
    # diploid 29 / 30.2 reads spanning the repeat region
    seqs = {nm: row.replace("-", "") for nm, row in zip(names, rows)}
    reads = tmp_path / "reads.fa"
    with open(reads, "w") as f:
        i = 0
        for nm in ("29", "30.2"):
            s = seqs[nm]
            for _ in range(120):
                st = int(rng.integers(300, len(s) - 400))
                f.write(f">r{i}\n{s[st:st + 100]}\n")
                i += 1
    from hisat2_tpu.genotype.driver import main
    out = tmp_path / "report.txt"
    rc = main(["--msa", str(msa), "-U", str(reads),
               "--out", str(out), "--top", "4"])
    assert rc == 0
    rep = open(out).read()
    ranked = [l for l in rep.splitlines() if "*" in l]
    top2 = "".join(ranked[:2])
    assert "*29" in top2 and "*30.2" in top2, rep
