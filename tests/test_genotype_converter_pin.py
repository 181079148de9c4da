"""Pin the STR (CODIS) and CYP converters against the REFERENCE
converter implementations on shared specs.

The reference modules are Python-2; the pure MSA-core functions
(convert_codis.py get_equal_score/SW_alignment/combine_alleles/
msf_alignment; extract_cyp_data.py create_map/splitString/makeVarDict/
makeSnp/makeDel/makeIns/makeMSF) are extracted and py3-adapted at test
time, then driven on synthetic specs shared with our converters
(genotype/strloci.py, genotype/cypvar.py)."""

import os
import re

import numpy as np
import pytest

REF_MOD = "/root/reference/hisatgenotype_modules"


def _codis_core(tmp_path):
    src = open(f"{REF_MOD}/hisatgenotype_convert_codis.py").read()
    parts = []
    for fn in ("def get_equal_score", "def SW_alignment",
               "def combine_alleles", "def msf_alignment"):
        i = src.index(fn)
        j = src.index('\n"""', i)
        parts.append(src[i:j])
    ns = {}
    exec("\n\n".join(parts), ns)
    return ns


def _read_allele(st):
    allele = []
    s = 0
    while s < len(st):
        ch = st[s]
        if ch == " ":
            s += 1
            continue
        if ch == "[":
            s += 1
            rep = ""
            while st[s] in "ACGT":
                rep += st[s]
                s += 1
            assert st[s] == "]"
            s += 1
            num = 0
            while s < len(st) and st[s].isdigit():
                num = num * 10 + int(st[s])
                s += 1
            allele.append([set([rep]), set([num])])
        else:
            rep = ""
            while s < len(st) and st[s] in "ACGT":
                rep += st[s]
                s += 1
            allele.append([set([rep]), set([1])])
    return allele


CODIS_SPECS = {
    "FGA": [("13", "[TTTC]3TTTTTTCT[CTTT]13CTCC[TTCC]2"),
            ("14", "[TTTC]3TTTTTTCT[CTTT]14CTCC[TTCC]2"),
            ("16", "[TTTC]3TTTTTTCT[CTTT]16CTCC[TTCC]2"),
            ("17.2", "[TTTC]3TTTTTTCT[CTTT]9CT[CTTT]8CTCC[TTCC]2")],
    "simple": [("11", "[AGAT]11"), ("12", "[AGAT]12")],
    "frac": [("5", "[AGAT]5"), ("6", "[AGAT]6"),
             ("6.3", "[AGAT]5AGA[AGAT]1")],
    "D21": [("24.2", "[TCTA]4[TCTG]6[TCTA]3TA[TCTA]3TCA[TCTA]2TCCATA"
                     "[TCTA]8TA TCTA"),
            ("25", "[TCTA]4[TCTG]6[TCTA]3TA[TCTA]3TCA[TCTA]2TCCATA"
                   "[TCTA]9"),
            ("28", "[TCTA]4[TCTG]6[TCTA]3TA[TCTA]3TCA[TCTA]2TCCATA"
                   "[TCTA]12")],
}


@pytest.mark.skipif(not os.path.isdir(REF_MOD),
                    reason="reference modules unavailable")
@pytest.mark.parametrize("locus", sorted(CODIS_SPECS))
def test_codis_msa_matches_reference(locus, tmp_path):
    from copy import deepcopy
    from hisat2_tpu.genotype.strloci import convert_str_locus
    core = _codis_core(tmp_path)
    spec = CODIS_SPECS[locus]
    alleles = [[aid, _read_allele(st)] for aid, st in spec]
    bb = deepcopy(alleles[-1][1])
    for _aid, a in reversed(alleles[:-1]):
        bb = core["combine_alleles"](bb, a)
        core["msf_alignment"](bb, a)
    ref_rows = {aid: core["msf_alignment"](bb, a)[0]
                for aid, a in alleles}
    names, rows = convert_str_locus(spec)
    ours = {nm: row.replace("-", ".") for nm, row in zip(names, rows)}
    assert ref_rows == ours


def _cyp_makemsf(tmp_path):
    """Full makeMSF + helpers, py3-adapted, chdir'd into tmp_path."""
    src = open(f"{REF_MOD}/hisatgenotype_extract_cyp_data.py").read()
    pieces = []
    for fn, endfn in (("def create_map", "def splitString"),
                      ("def splitString", "def extractSeq"),
                      ("def extractSeq", "def makeVarDict"),
                      ("def makeVarDict", "def makeSnp"),
                      ("def makeSnp", "def makeDel"),
                      ("def makeDel", "def makeIns"),
                      ("def makeIns", "def makeMSF"),
                      ("def makeMSF", "def build_msf_files")):
        i, j = src.index(fn), src.index(endfn)
        pieces.append(src[i:j])
    body = "import sys\n\n" + "\n".join(pieces)
    # join py2 line-continued prints before stripping them
    body = re.sub(r"% \\\n\s*", "% ", body)
    body = re.sub(r"print >> sys\.stdout, (.+)", r"pass", body)
    body = re.sub(r"print >> msfFile, (.+)", r"print(\1, file=msfFile)",
                  body)
    body = re.sub(r"^(\s*)print >> msfFile\s*$", r"\1print(file=msfFile)",
                  body, flags=re.M)
    body = re.sub(r"print\((['\"].*?)\)\n", r"pass\n", body)
    body = body.replace(
        "blast_allele_var = extract_var_from_blast",
        "raise IOError\n        blast_allele_var = extract_var_from_blast")
    ns = {"sys": __import__("sys")}
    exec(body, ns)
    return ns["makeMSF"]


@pytest.mark.skipif(not os.path.isdir(REF_MOD),
                    reason="reference modules unavailable")
def test_cyp_msa_matches_reference(tmp_path, monkeypatch):
    """Run the reference's full makeMSF on a synthetic gene + var table
    and compare every MSA row to our build_msa on the same inputs."""
    from hisat2_tpu.genotype.cypvar import build_msa, parse_var_table
    make_msf = _cyp_makemsf(tmp_path)
    rng = np.random.default_rng(88)
    ACGT = np.array(list("ACGT"))
    seq = "".join(ACGT[rng.integers(0, 4, 400)])
    o_pos, o_neg = 99, 100

    def at(gp):
        return seq[gp + (o_pos if gp > 0 else o_neg)]

    r1, r2 = at(20), at(-30)
    n1 = "ACGT"[("ACGT".index(r1) + 1) % 4]
    n2 = "ACGT"[("ACGT".index(r2) + 2) % 4]
    dseq = seq[50 + o_pos:53 + o_pos + 1]
    var_lines = [
        "CYPTEST*1\tNone",
        f"CYPTEST*2\t20{r1}>{n1}",
        f"CYPTEST*3\t-30{r2}>{n2},50_53del{dseq}",
        "CYPTEST*4\t70_71insTTAG",
        f"CYPTEST*5\t20{r1}>{n1},70_71insGG",
    ]
    for d in ("cyp_var_files", "cyp_fasta", "cyp_msf"):
        os.makedirs(tmp_path / d)
    # the reference's makeVarDict skips the first (header) line
    (tmp_path / "cyp_var_files/cyptest.var").write_text(
        "\n".join(["CYPTEST\tvariants"] + var_lines) + "\n")
    (tmp_path / "cyp_fasta/cyptest.fasta").write_text(
        ">cyptest\n" + seq + "\n")
    monkeypatch.chdir(tmp_path)
    make_msf("cyptest", o_pos, o_neg)
    ref_rows = {}
    for line in (tmp_path / "cyp_msf/TEST_gen.msf").read_text() \
            .splitlines():
        p = line.split()
        if len(p) >= 2:
            ref_rows.setdefault(p[0], []).append("".join(p[1:]))
    ref_full = {k: "".join(v) for k, v in ref_rows.items()}
    assert len(ref_full) == 5
    table = parse_var_table(var_lines)
    out = build_msa(seq, table, o_pos, o_neg)
    ours = {nm: row.replace("-", ".") for nm, row in zip(out[0], out[1])}
    for k, v in ref_full.items():
        kk = [o for n, o in ours.items()
              if n.split("*")[-1] == k.split("*")[-1]]
        assert kk and kk[0].upper() == v.upper(), k
