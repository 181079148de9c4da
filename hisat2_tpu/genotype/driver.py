"""HISAT-genotype driver: align -> compatibility classes -> EM -> calls.

Reference flow (hisatgenotype.py:275-489 genotype(); hisatgenotype_locus.py
typing()): reads align against a genome containing the typed locus's
allele collection; each read's equally-best allele set forms a
compatibility class; the EM ranks alleles; the report prints
"N ranked <allele> (abundance: X.XX%)" lines per gene.

Here each allele is one reference sequence in an allele FASTA (built by
`hisatgenotype_extract_vars`-style preprocessing or IMGT downloads);
alleles are grouped into genes by the name prefix before '*'
(HLA nomenclature: A*02:01 -> gene A).
"""

from __future__ import annotations

import sys

import numpy as np

from .typing import call_diploid, compatibility_classes, em_abundance


def run_genotype(args) -> int:
    from ..align.pipeline import TPUAligner
    from ..index.builder import build_fm_index
    from ..io.fasta import iter_fasta, read_batches

    alleles = list(iter_fasta(args.alleles))
    if not alleles:
        print("error: no allele sequences", file=sys.stderr)
        return 1
    bad = [nm for nm, _ in alleles if "-" in nm]
    if bad:
        # '-' is the compatibility-class separator (the reference joins
        # allele names with it, hisatgenotype_locus.py); IMGT names never
        # contain it
        print(f"error: allele names may not contain '-': {bad[:3]}",
              file=sys.stderr)
        return 1
    index = build_fm_index(alleles)
    names = index.meta.ref_names
    lengths = {nm: ln for nm, ln in zip(names, index.meta.ref_lens)}
    # -k must cover the allele count so every equally-best placement of a
    # read reports (the compatibility class is the full equal-best set)
    aligner = TPUAligner(index, k=max(len(alleles), 16), spliced=False)

    read_alleles = {}
    n_reads = 0
    for b in read_batches(args.reads, 4096):
        res = aligner.align_batch(b.codes, b.quals, b.lens)
        for i, name in enumerate(b.names):
            n_reads += 1
            alns = res.alignments[i]
            if not alns:
                continue
            best = max(a.score for a in alns)
            read_alleles[name] = {names[a.ref_id] for a in alns
                                  if a.score == best}
    cmpt = compatibility_classes(read_alleles)

    # group by gene (prefix before '*'; single group when absent)
    genes = sorted({nm.split("*")[0] for nm in names})
    out = open(args.out, "w") if args.out else sys.stdout
    out.write(f"{n_reads} reads, {len(read_alleles)} on-locus\n")
    for gene in genes:
        gc = {k: v for k, v in cmpt.items()
              if all(a.split("*")[0] == gene for a in k.split("-"))}
        if not gc:
            continue
        ranked = em_abundance(gc, lengths)
        out.write(f"Gene {gene}\n")
        for rank, (allele, prob) in enumerate(ranked[:args.top]):
            out.write("\t%d ranked %s (abundance: %.2f%%)\n"
                      % (rank + 1, allele, prob * 100.0))
        calls = call_diploid(ranked)
        if calls:
            out.write("\tcall: %s\n" % " / ".join(calls))
    if args.out:
        out.close()
    return 0


def build_parser():
    import argparse
    p = argparse.ArgumentParser(prog="hisat2-tpu genotype")
    p.add_argument("--alleles", required=True,
                   help="allele FASTA (one sequence per allele; names "
                        "like GENE*NN:NN group into genes)")
    p.add_argument("-U", dest="reads", required=True,
                   help="reads (FASTA/FASTQ)")
    p.add_argument("--out", default=None, help="report file (stdout)")
    p.add_argument("--top", type=int, default=5,
                   help="ranked alleles to print per gene")
    return p


def main(argv=None):
    return run_genotype(build_parser().parse_args(argv))
