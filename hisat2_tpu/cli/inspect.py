"""hisat2-tpu-inspect: index inspection CLI
(reference: /root/reference/hisat2_inspect.cpp).

Modes: default = reconstruct FASTA from the packed reference; -n names;
-s summary."""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="hisat2-tpu-inspect")
    p.add_argument("base", help="index basename")
    p.add_argument("-n", "--names", action="store_true",
                   help="print reference names only")
    p.add_argument("-s", "--summary", action="store_true",
                   help="print summary only")
    p.add_argument("--snp", action="store_true", help="print SNPs")
    p.add_argument("--ss", action="store_true", help="print splice sites")
    args = p.parse_args(argv)

    from ..index.format import FMIndex
    from ..utils import bitops

    idx = FMIndex.load(args.base)
    m = idx.meta
    if args.names:
        for nm in m.ref_names:
            print(nm)
        return 0
    if args.summary:
        print(f"Flags\t0")
        print(f"SA-Sample\t1 in {1 << m.off_rate}")
        print(f"FtabChars\t{m.ftab_k}")
        for i, (nm, ln) in enumerate(zip(m.ref_names, m.ref_lens)):
            print(f"Sequence-{i + 1}\t{nm}\t{ln}")
        return 0
    if args.snp or args.ss:
        from ..index.variants import print_variants
        print_variants(None, snps=args.snp, ss=args.ss, base=args.base)
        return 0
    # reconstruct FASTA: fragments back into per-reference sequences with
    # N gaps restored
    joined = bitops.unpack_2bit(np.asarray(idx.ref_words), m.n)
    fj = np.asarray(idx.frag_joined)
    fr = np.asarray(idx.frag_ref)
    fo = np.asarray(idx.frag_off)
    for rid, (nm, ln) in enumerate(zip(m.ref_names, m.ref_lens)):
        seq = np.full(ln, 4, np.uint8)
        for f in np.flatnonzero(fr == rid):
            span = fj[f + 1] - fj[f]
            seq[fo[f]:fo[f] + span] = joined[fj[f]:fj[f + 1]]
        print(f">{nm}")
        s = bitops.decode_dna(seq)
        for i in range(0, len(s), 60):
            print(s[i:i + 60])
    return 0


if __name__ == "__main__":
    sys.exit(main())
