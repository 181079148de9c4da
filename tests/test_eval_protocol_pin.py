"""Pin the evaluation harness's reference-protocol scorer against the
REFERENCE calculate_read_cost.py comparison functions on shared inputs.

The reference tool is Python-2; compare_single_sam + its helpers are
extracted and py3-adapted at test time, fed the same (aligner output,
truth) record sets as our rp_compare_single, and the full 8-tuple
(mapped, unique_mapped, unmapped, aligned, multi_aligned,
temp_junctions, temp_gtf_junctions, mapping_point) must match."""

import os
import re
import sys

import pytest

REF = "/root/reference/evaluation/simulation/calculate_read_cost.py"
sys.path.insert(0, "/root/repo/evaluation")


def _ref_compare(tmp_path):
    src = open(REF).read()
    pieces = ["import sys\nimport re\ncigar_re = re.compile('\\\\d+\\\\w')\n"
              "from functools import cmp_to_key\n"]
    for fn, endfn in (("def reverse_complement", "def read_genome"),
                      ("def to_junction_str", "def junction_cmp"),
                      ("def junction_cmp", "def get_junctions"),
                      ("def get_junctions", "def get_right"),
                      ("def get_right", "def get_cigar_chars"),
                      ("def get_cigar_chars", "def get_cigar_chars_MN"),
                      ("def is_junction_read", "def is_junction_pair"),
                      ("def is_canonical_junction",
                       "def is_small_exon_junction_read"),
                      ("def find_in_gtf_junctions", "def compare_single_sam"),
                      ("def compare_single_sam", "def compare_paired_sam")):
        i, j = src.index(fn), src.index(endfn)
        pieces.append(src[i:j])
    body = "\n".join(pieces)
    body = re.sub(r"% \\\n\s*", "% ", body)
    body = re.sub(r"print >> sys\.stderr, (.+)", r"pass", body)
    body = re.sub(r"print >> sys\.stdout, (.+)", r"pass", body)
    body = re.sub(r"print >> mapped_file, (.+)",
                  r"print(\1, file=mapped_file)", body)
    body = body.replace("sorted(list(temp2_junctions), cmp=junction_cmp)",
                        "sorted(list(temp2_junctions), "
                        "key=cmp_to_key(junction_cmp))")
    body = body.replace("m = (l + u) / 2", "m = (l + u) // 2")
    ns = {}
    exec(body, ns)
    return ns


FIXTURE_GENOME = {"chrE": None}


def _mk_genome():
    import numpy as np
    rng = np.random.default_rng(9)
    g = rng.integers(0, 4, 30000)
    # make the junction at (4999, 5201) canonical GT..AG
    g[5000:5002] = [2, 3]
    g[5198:5200] = [0, 2]
    return "".join("ACGT"[c] for c in g)


# shared corpus: aligner records + truth records (text form the
# reference's compare_single_sam reads)
ALIGNER_RECORDS = [
    # unique correct ungapped
    ("r1", "chrE", 101, "100M"),
    # multimapped read (2 placements)
    ("r2", "chrE", 501, "100M"),
    ("r2", "chrE", 901, "100M"),
    # junction read on the GTF junction
    ("r3", "chrE", 4951, "50M200N50M"),
    # junction read, 3 bp shifted novel twin of the GTF junction
    # (non-canonical at the shifted point -> GTF-snapped by relax)
    ("r4", "chrE", 4948, "50M200N50M"),
    # novel junction far from GTF
    ("r5", "chrE", 12001, "40M500N60M"),
    # wrong position for r6
    ("r6", "chrE", 2001, "100M"),
    # same pos as truth but different ops for r7
    ("r7", "chrE", 3001, "50M1I49M"),
]
TRUTH_RECORDS = [
    ("r1", "chrE", 101, "100M"),
    ("r2", "chrE", 501, "100M"),
    ("r3", "chrE", 4951, "50M200N50M"),
    ("r4", "chrE", 4951, "50M200N50M"),
    ("r5", "chrE", 12001, "40M500N60M"),
    ("r6", "chrE", 2101, "100M"),
    ("r7", "chrE", 3001, "100M"),
    ("r8", "chrE", 7001, "100M"),          # unaligned by the aligner
]
GTF_JUNCTIONS = [("chrE", 5000, 5201)]


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference evaluation tool unavailable")
def test_compare_single_matches_reference(tmp_path):
    from calculate_read_cost import rp_compare_single
    ns = _ref_compare(tmp_path)
    chr_dic = {"chrE": _mk_genome()}
    # reference file forms
    ref_sam = tmp_path / "aligner.txt"     # reference_sam param
    with open(ref_sam, "w") as f:
        for nm, c, p, cg in ALIGNER_RECORDS:
            f.write(f"{nm}\t{c}\t{p}\t{cg}\tNM:i:0\n")
    qry_sam = tmp_path / "truth.txt"       # query_sam param
    with open(qry_sam, "w") as f:
        for nm, c, p, cg in TRUTH_RECORDS:
            f.write(f"{nm}\t{c}\t{p}\t{cg}\tNM:i:0\n")
    gtf_junctions = [list(j) for j in GTF_JUNCTIONS]
    gtf_set = {ns["to_junction_str"](list(j)) for j in GTF_JUNCTIONS}
    ref_out = ns["compare_single_sam"](
        False, str(ref_sam), str(qry_sam), str(tmp_path / "mapped"),
        chr_dic, gtf_junctions, gtf_set, set())
    # ours, on dict forms of the same records
    al = {}
    for nm, c, p, cg in ALIGNER_RECORDS:
        al.setdefault(nm, []).append((c, p, cg))
    tr = {}
    for nm, c, p, cg in TRUTH_RECORDS:
        tr.setdefault(nm, []).append((c, p, cg))
    ours = rp_compare_single(al, tr, chr_dic, list(GTF_JUNCTIONS),
                             set(GTF_JUNCTIONS))
    assert tuple(ref_out) == tuple(ours), (ref_out, ours)
