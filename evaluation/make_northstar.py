#!/usr/bin/env python3
"""North-star (BASELINE config 6) fixture generator: a GRCh38-scale
synthetic genome + variant/splice-site inputs (real GRCh38/dbSNP/GTF
data is not downloadable in this offline environment).

Shape matches the grch38_snp_tran recipe the reference documents
(scripts/make_grch38_snp_tran.sh; MANUAL.markdown:1857): 3.12 Gbp over
24 chromosomes, ~1 M small variants (90% SNV / 5% del / 5% ins like
dbSNP's common-variant mix), ~200 K splice sites (~20 K genes x ~10
introns).  Deterministic (seed 20260819).

  python evaluation/make_northstar.py [--dir /tmp/northstar]

writes big.fa, big.snp, big.ss; then:

  python -m hisat2_tpu build /tmp/northstar/big.fa /tmp/northstar/bigidx \
      --snp /tmp/northstar/big.snp --ss /tmp/northstar/big.ss
  python bench.py --config 6
"""

from __future__ import annotations

import argparse
import os

import numpy as np

ACGT = np.array(list("ACGT"))
N_CHROM = 24
CHROM_BP = 130_000_000      # 24 x 130 Mbp = 3.12 Gbp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/northstar")
    ap.add_argument("--chrom-bp", type=int, default=CHROM_BP)
    ap.add_argument("--n-chrom", type=int, default=N_CHROM)
    args = ap.parse_args()
    os.makedirs(args.dir, exist_ok=True)
    rng = np.random.default_rng(20260819)
    fa = os.path.join(args.dir, "big.fa")
    snp = open(os.path.join(args.dir, "big.snp"), "w")
    ss = open(os.path.join(args.dir, "big.ss"), "w")
    vid = 0
    with open(fa, "w") as f:
        for c in range(args.n_chrom):
            name = f"chr{c + 1}"
            codes = rng.integers(0, 4, args.chrom_bp, dtype=np.int8)
            s = "".join(ACGT)  # noqa: F841 (keep ACGT referenced)
            seq = ACGT[codes]
            f.write(f">{name}\n")
            row = seq.view(f"U1").reshape(-1)
            # 80-col wrapped FASTA without building one giant string
            W = 80
            nrow = args.chrom_bp // W
            body = "\n".join(
                "".join(x) for x in
                seq[:nrow * W].reshape(nrow, W))
            f.write(body + "\n")
            tail = "".join(seq[nrow * W:])
            if tail:
                f.write(tail + "\n")
            del body, row
            # ~1 M variants genome-wide -> ~42 K per chromosome
            n_var = 1_000_000 // args.n_chrom
            pos = np.sort(rng.choice(
                np.arange(1000, args.chrom_bp - 1000), n_var,
                replace=False))
            kinds = rng.random(n_var)
            for p, kr in zip(pos, kinds):
                p = int(p)
                if kr < 0.90:
                    alt = "ACGT"[(int(codes[p]) + 1
                                  + int(rng.integers(3))) % 4]
                    snp.write(f"rs{vid}\tsingle\t{name}\t{p}\t{alt}\n")
                elif kr < 0.95:
                    snp.write(f"rs{vid}\tdeletion\t{name}\t{p}\t"
                              f"{int(rng.integers(1, 6))}\n")
                else:
                    ins = "".join("ACGT"[x] for x in rng.integers(
                        0, 4, int(rng.integers(1, 6))))
                    snp.write(f"rs{vid}\tinsertion\t{name}\t{p}\t{ins}\n")
                vid += 1
            # ~200 K splice sites -> ~8.3 K per chromosome
            n_ss = 200_000 // args.n_chrom
            left = np.sort(rng.choice(
                np.arange(5000, args.chrom_bp - 20000), n_ss,
                replace=False))
            ilen = rng.integers(80, 10000, n_ss)
            for lo, il in zip(left, ilen):
                ss.write(f"{name}\t{int(lo)}\t{int(lo + il)}\t+\n")
            del codes, seq
            print(f"[northstar] {name} done", flush=True)
    snp.close()
    ss.close()
    print(f"[northstar] wrote {fa}")


if __name__ == "__main__":
    main()
