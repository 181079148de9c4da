#!/usr/bin/env python3
"""Accuracy + speed harness (TPU-native equivalent of
/root/reference/evaluation/{simulation,real}/calculate_read_cost.py).

Given a truth SAM (from `python -m hisat2_tpu simulate-reads`) and one or
more aligner outputs, reports per-aligner:
  - wall time (with --run),
  - read-level accuracy, split by read class like the reference harness
    (reference: extract_single/extract_pair + is_junction_read,
    calculate_read_cost.py:173-709): ungapped (M-only CIGAR), junction
    (CIGAR contains N), gapped (I/D, no N),
  - pair-level accuracy (both mates of a pair correct — the reference's
    paired classification),
  - junction-level precision/recall vs the truth SAM's junction set
    (get_junctions over CIGARs, reference :173-217).

A read is CORRECT when its primary alignment's (ref, pos) matches the
truth within --slack bases; a junction matches exactly (chr, left,
right), like to_junction_str equality in the reference.

Usage:
  calculate_read_cost.py --truth truth.sam out1.sam [out2.sam ...]
  calculate_read_cost.py --run "-x idx -f -U reads.fa" --truth truth.sam
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
import time

_CIG = re.compile(r"(\d+)([MIDNSHP=X])")


def cigar_junctions(chrom, pos, cigar):
    """(chr, last-exonic-left, first-exonic-right) per N op — the
    reference's get_junctions (calculate_read_cost.py:173-217)."""
    out = []
    right = pos
    for n, op in _CIG.findall(cigar):
        n = int(n)
        if op in "M=XD":
            right += n
        elif op == "N":
            out.append((chrom, right - 1, right + n))
            right += n
    return out


def read_class(cigar):
    ops = {op for _, op in _CIG.findall(cigar)}
    if "N" in ops:
        return "junction"
    if ops & {"I", "D"}:
        return "gapped"
    return "ungapped"


def parse_sam(path):
    """{(name, mate): (chr, pos, cigar)} for primary alignments; None for
    unaligned records."""
    pos = {}
    for line in open(path):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        flag = int(f[1])
        mate = 2 if (flag & 0xC0) == 0x80 else 1
        if flag & 0x104:        # secondary or unmapped
            if flag & 0x4:
                pos.setdefault((f[0], mate), None)
            continue
        pos[(f[0], mate)] = (f[2], int(f[3]), f[5])
    return pos


def score(truth, got, slack):
    classes = {}
    pair_ok = {}
    junc_true = set()
    junc_got = set()
    n = aligned = correct = 0
    for k, tp in truth.items():
        if tp is None:
            continue
        n += 1
        cls = read_class(tp[2])
        cstat = classes.setdefault(cls, [0, 0, 0])   # n, aligned, correct
        cstat[0] += 1
        junc_true.update(cigar_junctions(*tp))
        gp = got.get(k)
        name, mate = k
        if gp is None:
            pair_ok.setdefault(name, True)
            pair_ok[name] = False
            continue
        aligned += 1
        cstat[1] += 1
        junc_got.update(cigar_junctions(*gp))
        ok = gp[0] == tp[0] and abs(gp[1] - tp[1]) <= slack
        correct += int(ok)
        cstat[2] += int(ok)
        pair_ok.setdefault(name, True)
        pair_ok[name] &= ok
    jt, jg = len(junc_true), len(junc_got)
    jtp = len(junc_true & junc_got)
    pairs = [v for v in pair_ok.values()]
    return dict(n=n, aligned=aligned, correct=correct, classes=classes,
                pairs=len(pairs), pairs_ok=sum(pairs),
                junc_truth=jt, junc_found=jg, junc_tp=jtp)


def report(sam, s):
    pct = lambda a, b: f"{100.0 * a / max(b, 1):.2f}%"  # noqa: E731
    print(f"{sam}:")
    print(f"  reads {s['n']}, aligned {s['aligned']} "
          f"({pct(s['aligned'], s['n'])}), correct {s['correct']} "
          f"({pct(s['correct'], s['n'])} of all, "
          f"{pct(s['correct'], s['aligned'])} of aligned)")
    for cls in ("ungapped", "gapped", "junction"):
        if cls not in s["classes"]:
            continue
        cn, ca, cc = s["classes"][cls]
        print(f"  {cls:9s}: {cn} reads, aligned {ca} ({pct(ca, cn)}), "
              f"correct {cc} ({pct(cc, cn)})")
    if s["pairs"] and s["pairs"] != s["n"]:
        print(f"  pairs    : {s['pairs']}, both-mates-correct "
              f"{s['pairs_ok']} ({pct(s['pairs_ok'], s['pairs'])})")
    if s["junc_truth"]:
        prec = pct(s["junc_tp"], s["junc_found"])
        rec = pct(s["junc_tp"], s["junc_truth"])
        print(f"  junctions: truth {s['junc_truth']}, found "
              f"{s['junc_found']}, TP {s['junc_tp']} "
              f"(precision {prec}, recall {rec})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--truth", required=True, help="ground-truth SAM")
    ap.add_argument("--slack", type=int, default=5,
                    help="positional tolerance (bp)")
    ap.add_argument("--run", default=None,
                    help="hisat2-tpu align args to run and time first")
    ap.add_argument("sams", nargs="*", help="aligner SAM outputs to score")
    args = ap.parse_args()
    truth = parse_sam(args.truth)
    sams = list(args.sams)
    if args.run:
        out = "eval_run.sam"
        t0 = time.time()
        subprocess.run([sys.executable, "-m", "hisat2_tpu", "align"]
                       + args.run.split() + ["-S", out], check=True)
        print(f"[run] {time.time() - t0:.1f}s -> {out}")
        sams.append(out)
    for sam in sams:
        report(sam, score(truth, parse_sam(sam), args.slack))


if __name__ == "__main__":
    main()
