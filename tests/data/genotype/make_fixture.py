#!/usr/bin/env python3
"""Generate a synthetic IMGT-style DB and run the (py3-shimmed) reference
hisatgenotype_extract_vars.py on it to produce committed oracle outputs."""
import os
import re
import subprocess
import sys

import numpy as np

W = "/tmp/gt_oracle"
ACGT = np.array(list("ACGT"))


def make_db(seed=11):
    rng = np.random.default_rng(seed)
    os.makedirs(f"{W}/hisatgenotype_db/HLA/msf", exist_ok=True)
    os.makedirs(f"{W}/hisatgenotype_db/HLA/fasta", exist_ok=True)
    L = 1200
    bb = rng.integers(0, 4, L)
    n = 24
    names, rows = [], []
    for a in range(n):
        seq = ACGT[bb].copy().astype(object)
        # SNVs
        for p in rng.choice(L, int(rng.integers(3, 15)), replace=False):
            seq[p] = "ACGT"[(bb[p] + 1 + int(rng.integers(0, 3))) % 4]
        # one deletion run for ~half the alleles
        if a % 2 == 1:
            dl = int(rng.integers(1, 7))
            dp = int(rng.integers(50, L - 60))
            for d in range(dl):
                seq[dp + d] = "."
        # a shared deletion (same coords for several alleles -> freq)
        if a % 5 == 0:
            for d in range(3):
                seq[400 + d] = "."
        # low-freq insertion block: alleles 20-23 carry bases in columns
        # that are '.' for everyone else -> only matters with min_var_freq
        name = f"A*{a // 8 + 1:02d}:{a % 8 + 1:02d}:01:01"
        names.append(name)
        rows.append("".join(seq))
    # insertion columns: splice two extra columns after col 700
    ins_here = {21}
    rows = [r[:700] + ("GT" if i in ins_here else "..") + r[700:]
            for i, r in enumerate(rows)]

    with open(f"{W}/hisatgenotype_db/HLA/msf/A_gen.msf", "w") as f:
        f.write("MSF: %d Type: N Jan 1, 2026 Check: 0 ..\n\n" % (L + 2))
        for nm in names:
            f.write(f" Name: {nm} Len: {L+2} Check: 0 Weight: 1.0\n")
        f.write("\n//\n\n")
        for s in range(0, L + 2, 50):
            for i, nm in enumerate(names):
                f.write(f"{nm} {rows[i][s:s+50]}\n")
            f.write("\n")

    with open(f"{W}/hisatgenotype_db/HLA/fasta/A_gen.fasta", "w") as f:
        for i, nm in enumerate(names):
            seq = rows[i].replace(".", "")
            f.write(f">HLA:HLA{i:05d} {nm} {len(seq)} bp\n")
            for s in range(0, len(seq), 60):
                f.write(seq[s:s + 60] + "\n")

    ref = names[0]
    with open(f"{W}/hisatgenotype_db/HLA/hla.dat", "w") as f:
        for i, nm in enumerate(names):
            f.write(f"DE   HLA-{nm}, human MHC sequence\n")
            if nm == ref:
                gl = len(rows[i].replace(".", ""))
                third = gl // 3
                f.write(f"FT   exon          {1}..{third}\n")
                f.write(f"FT   exon          {third+51}..{2*third}\n")
            if i == 5:  # mark one partial
                f.write(f"DE   HLA-{nm}FAKEPART, partial sequence\n")
    return names, rows


def make_hisat2_shim():
    os.makedirs(f"{W}/bin", exist_ok=True)
    with open(f"{W}/bin/hisat2", "w") as f:
        f.write(r'''#!/usr/bin/env python3
import sys
args = sys.argv[1:]
seq = None; fasta = None
for i, a in enumerate(args):
    if a == "-c":
        seq = args[i + 1]
    if a == "-f" and i + 1 < len(args) and not args[i+1].startswith("-"):
        fasta = args[i + 1]
print("@HD\tVN:1.0")
if seq is not None:
    print("\t".join(["bb", "0", "6", "29942471", "255",
                     f"{len(seq)}M", "*", "0", "0", "*", "*",
                     "AS:i:0", "NM:i:0"]))
else:
    name, s = None, ""
    for line in open(fasta):
        if line.startswith(">"):
            if name: break
            name = line[1:].split()[0]
        else:
            s += line.strip()
    print("\t".join([name, "0", "6", "29942471", "255",
                     f"{len(s)}M", "*", "0", "0", "*", "*",
                     "AS:i:0", "NM:i:0"]))
''')
    os.chmod(f"{W}/bin/hisat2", 0o755)


def shim_reference():
    src = open("/root/reference/hisatgenotype_extract_vars.py").read()
    # join backslash continuations so print-statement regexes see one line
    src = re.sub(r"\\\n\s*", " ", src)
    src = src.replace("sys.maxint", "sys.maxsize")
    src = re.sub(r"print >> ([A-Za-z_][A-Za-z_0-9.]*), (.+)",
                 r"print(\2, file=\1)", src)
    src = re.sub(r"(?m)^(\s*)print ([^(>].*)$", r"\1print(\2)", src)
    src = re.sub(r", cmp=([A-Za-z_][A-Za-z_0-9]*)\)",
                 r", key=__cmp_to_key(\1))", src)
    src = src.replace("for key in genes.keys():",
                      "for key in list(genes.keys()):")
    src = src.replace("< backbone_freq", "< len(backbone_freq)")
    src = src.replace("<= backbone_freq", "<= len(backbone_freq)")
    src = src.replace(
        "import os, sys, subprocess, re",
        "import os, sys, subprocess, re\n"
        "from functools import cmp_to_key as __cmp_to_key\n"
        "_Popen = subprocess.Popen\n"
        "subprocess.Popen = lambda *a, **k: _Popen("
        "*a, universal_newlines=True, **k)")
    # typing_common lives in hisatgenotype_modules
    src = src.replace(
        "import hisatgenotype_typing_common as typing_common, "
        "hisatgenotype_gene_typing as gene_typing",
        "class typing_common:\n"
        "    _C = {'A':'T','C':'G','G':'C','T':'A','.':'.','N':'N'}\n"
        "    @staticmethod\n"
        "    def reverse_complement(s):\n"
        "        return ''.join(typing_common._C.get(c,'N')"
        " for c in reversed(s))\n"
        "    @staticmethod\n"
        "    def check_files(fns):\n"
        "        return all(os.path.exists(f) for f in fns)\n"
        "    @staticmethod\n"
        "    def download_genome_and_index(): pass\n"
        "    @staticmethod\n"
        "    def clone_hisatgenotype_database(): pass")
    open(f"{W}/extract_vars_ref.py", "w").write(src)


def main():
    os.makedirs(W, exist_ok=True)
    make_db()
    make_hisat2_shim()
    shim_reference()
    # placate check_files(["grch38", "genome.fa", "genome.fa.fai"])
    for fn in ("grch38", "genome.fa", "genome.fa.fai"):
        open(f"{W}/{fn}", "w").close()
    env = dict(os.environ)
    env["PATH"] = f"{W}/bin:" + env["PATH"]
    for base, extra in (("out0/hla", ["--no-partial", "--leftshift"]),
                        ("out5/hla", ["--no-partial", "--leftshift",
                                  "--min-var-freq", "5.0"])):
        r = subprocess.run(
            [sys.executable, f"{W}/extract_vars_ref.py", "-b", base]
            + extra, cwd=W, env=env, capture_output=True, text=True,
            timeout=600)
        print(base, "rc:", r.returncode)
        if r.returncode:
            print(r.stderr[-4000:])
            sys.exit(1)
        sys.stderr.write(r.stderr[-600:] + "\n")


if __name__ == "__main__":
    main()
