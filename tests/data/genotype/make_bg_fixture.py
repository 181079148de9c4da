#!/usr/bin/env python3
"""Oracle fixture for build_genotype_genome: hand-crafted 2-gene database
+ common variants, run through the py3-shimmed reference
hisatgenotype_build_genome.py with samtools/hisat2-build shims."""
import os
import re
import subprocess
import sys

import numpy as np

W = "/tmp/gt_oracle/bg"
ACGT = np.array(list("ACGT"))


def make_inputs(seed=23):
    rng = np.random.default_rng(seed)
    os.makedirs(W, exist_ok=True)
    chr6 = "".join(ACGT[rng.integers(0, 4, 30000)])
    chr7 = "".join(ACGT[rng.integers(0, 4, 12000)])
    with open(f"{W}/genome.fa", "w") as f:
        f.write(">6 fake chr6 fragment\n")
        for s in range(0, len(chr6), 60):
            f.write(chr6[s:s + 60] + "\n")
        f.write(">7 fake chr7 fragment\n")
        for s in range(0, len(chr7), 60):
            f.write(chr7[s:s + 60] + "\n")

    # two genes on chr6: A at [5000,6199] (span 1200, backbone 1250 ->
    # off +50), B at [9000,9899] (span 900, backbone 920 -> off +20);
    # one gene on chr7 untouched-by-commonvars
    genes = [("A", "6", 5000, 6199, 1250),
             ("B", "6", 9000, 9899, 920),
             ("C", "7", 2000, 2599, 600)]
    with open(f"{W}/hla.locus", "w") as f:
        for g, ch, l, r, blen in genes:
            f.write(f"{g}*BACKBONE\t{ch}\t{l}\t{r}\t{blen}"
                    f"\t0-{blen-1}\t+\n")
    with open(f"{W}/hla_backbone.fa", "w") as f:
        bbs = {}
        for g, ch, l, r, blen in genes:
            bb = "".join(ACGT[rng.integers(0, 4, blen)])
            bbs[g] = bb
            f.write(f">{g}*BACKBONE\n")
            for s in range(0, blen, 60):
                f.write(bb[s:s + 60] + "\n")
    # per-gene vars: single / deletion / insertion
    with open(f"{W}/hla.snp", "w") as fs, \
         open(f"{W}/hla.index.snp", "w") as fi, \
         open(f"{W}/hla.link", "w") as fl, \
         open(f"{W}/hla.haplotype", "w") as fh:
        n = ht = 0
        for g, ch, l, r, blen in genes:
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
                if k != 4:   # one var excluded from index set
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
    with open(f"{W}/hla_sequences.fa", "w") as f:
        f.write(">A*01:01\nACGT\n")
    with open(f"{W}/hla.partial", "w") as f:
        f.write("A*77:77\n")

    # common variants (UCSC-style, genome coords): before A, inside A
    # (dropped), between A and B, inside B (dropped), after B, on chr7
    # before/after C
    cv = [("6", 1000, "single", "A"),
          ("6", 5500, "single", "C"),        # inside A -> dropped
          ("6", 7000, "deletion", 3),
          ("6", 9100, "single", "G"),        # inside B -> dropped
          ("6", 20000, "insertion", "CAT"),
          ("7", 500, "single", "T"),
          ("7", 2100, "single", "A"),        # inside C -> dropped
          ("7", 8000, "deletion", 2)]
    with open(f"{W}/snp144Common.snp", "w") as f:
        for i, (ch, pos, kind, data) in enumerate(cv):
            f.write(f"cv{i}\t{kind}\t{ch}\t{pos}\t{data}\n")
    with open(f"{W}/snp144Common.haplotype", "w") as f:
        f.write("ht0\t6\t1000\t1000\tcv0\n")
        f.write("ht1\t6\t7000\t7002\tcv2\n")
        f.write("ht2\t6\t5500\t5500\tcv1\n")   # inside A -> dropped
        f.write("ht3\t7\t500\t500\tcv5\n")


def make_shims():
    os.makedirs(f"{W}/bin", exist_ok=True)
    with open(f"{W}/bin/samtools", "w") as f:
        f.write("#!/bin/sh\nexit 0\n")
    with open(f"{W}/bin/hisat2-build", "w") as f:
        f.write("#!/bin/sh\nfor i in 1 2 3 4 5 6 7 8; do"
                " touch \"${@: -1}.$i.ht2\"; done\nexit 0\n")
    os.chmod(f"{W}/bin/samtools", 0o755)
    os.chmod(f"{W}/bin/hisat2-build", 0o755)


def shim_reference():
    for src_path, out_name in (
            ("/root/reference/hisatgenotype_build_genome.py",
             "build_genome_ref.py"),
            ("/root/reference/hisatgenotype_modules/"
             "hisatgenotype_typing_common.py",
             "hisatgenotype_typing_common.py")):
        src = open(src_path).read()
        src = re.sub(r"\\\n\s*", " ", src)
        src = src.replace("sys.maxint", "sys.maxsize")
        src = re.sub(r"print >> ([A-Za-z_][A-Za-z_0-9.]*), (.+)",
                     r"print(\2, file=\1)", src)
        src = re.sub(r"(?m)^(\s*)print ([^(>].*)$", r"\1print(\2)", src)
        src = re.sub(r"(?m)^(\s*)print$", r"\1print()", src)
        src = re.sub(r"(?m)(:\s*)print ([^(>].*)$", r"\1print(\2)", src)
        src = re.sub(r", cmp=([A-Za-z_][A-Za-z_0-9]*)\)",
                     r", key=__cmp_to_key(\1))", src)
        src = re.sub(r"sorted\(([A-Za-z_][A-Za-z_0-9.]*), cmp_varKey\)",
                     r"sorted(\1, key=__cmp_to_key(cmp_varKey))", src)
        src = ("from functools import cmp_to_key as __cmp_to_key\n"
               + src)
        src = src.replace("import hisatgenotype_typing_common as "
                          "typing_common",
                          "import sys; sys.path.insert(0, %r); "
                          "import hisatgenotype_typing_common as "
                          "typing_common" % W)
        # gene_cmp has a typo (a_lenght) the py2 runtime never hit
        src = src.replace("a_lenght", "a_length")
        open(f"{W}/{out_name}", "w").write(src)


def main():
    make_inputs()
    make_shims()
    shim_reference()
    with open(f"{W}/hisatgenotype_gene_typing.py", "w") as f:
        f.write("def clone_IMGTHLA_database():\n    pass\n")
    for fn in ("grch38", "genome.fa.fai"):
        open(f"{W}/{fn}", "w").close()
    env = dict(os.environ)
    env["PATH"] = f"{W}/bin:" + env["PATH"]
    r = subprocess.run(
        [sys.executable, f"{W}/build_genome_ref.py", "--base", "refgg",
         "--database-list", "hla", "--commonvar"],
        cwd=W, env=env, capture_output=True, text=True, timeout=600)
    print("rc:", r.returncode)
    if r.returncode:
        print(r.stderr[-4000:])
        sys.exit(1)
    sys.stderr.write(r.stderr[-400:] + "\n")


if __name__ == "__main__":
    main()
