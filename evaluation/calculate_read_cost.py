#!/usr/bin/env python3
"""Accuracy + speed harness (TPU-native equivalent of
/root/reference/evaluation/{simulation,real}/calculate_read_cost.py).

Given a truth SAM (from `python -m hisat2_tpu simulate-reads`) and one or
more aligner outputs, reports per-aligner wall time, alignment rate, and
accuracy: a read is CORRECT when its primary alignment's (ref, pos)
matches the truth within --slack bases (junction-aware positions are
compared on the leftmost aligned base, like the reference harness).

Usage:
  calculate_read_cost.py --truth truth.sam out1.sam [out2.sam ...]
  calculate_read_cost.py --run "-x idx -f -U reads.fa" --truth truth.sam
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time


def primary_positions(path):
    pos = {}
    for line in open(path):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        flag = int(f[1])
        if flag & 0x104:        # secondary or unmapped
            if flag & 0x4:
                mate = 2 if (flag & 0xC0) == 0x80 else 1
                pos.setdefault((f[0], mate), None)
            continue
        mate = 2 if (flag & 0xC0) == 0x80 else 1
        pos[(f[0], mate)] = (f[2], int(f[3]))
    return pos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--truth", required=True, help="ground-truth SAM")
    ap.add_argument("--slack", type=int, default=5,
                    help="positional tolerance (bp)")
    ap.add_argument("--run", default=None,
                    help="hisat2-tpu align args to run and time first")
    ap.add_argument("sams", nargs="*", help="aligner SAM outputs to score")
    args = ap.parse_args()
    truth = primary_positions(args.truth)
    sams = list(args.sams)
    if args.run:
        out = "eval_run.sam"
        t0 = time.time()
        subprocess.run([sys.executable, "-m", "hisat2_tpu", "align"]
                       + args.run.split() + ["-S", out], check=True)
        print(f"[run] {time.time() - t0:.1f}s -> {out}")
        sams.append(out)
    for sam in sams:
        got = primary_positions(sam)
        n = len(truth)
        aligned = correct = 0
        for k, tp in truth.items():
            gp = got.get(k)
            if gp is None:
                continue
            aligned += 1
            if tp is not None and gp[0] == tp[0] \
                    and abs(gp[1] - tp[1]) <= args.slack:
                correct += 1
        print(f"{sam}: reads {n}, aligned {aligned} "
              f"({100.0 * aligned / max(n, 1):.2f}%), correct {correct} "
              f"({100.0 * correct / max(n, 1):.2f}% of all, "
              f"{100.0 * correct / max(aligned, 1):.2f}% of aligned)")


if __name__ == "__main__":
    main()
