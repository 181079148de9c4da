"""SAM output formatting (reference: /root/reference/sam.h SamConfig,
aln_sink.h:1363-1480 AlnSinkSam::appendMate).

Host-side: the device produces (position, score, edit-count) tuples; this
module renders SAM lines with the same field/tag layout as the reference
(AS, ZS, XN, XM, XO, XG, NM, MD, NH, YT) and the end-of-run summary of
AlnSink::printAlSumm (aln_sink.cpp).
"""

from __future__ import annotations

import io as _io

import numpy as np

from ..utils import bitops

FLAG_PAIRED = 0x1
FLAG_PROPER = 0x2
FLAG_UNMAPPED = 0x4
FLAG_MATE_UNMAPPED = 0x8
FLAG_REVERSE = 0x10
FLAG_MATE_REVERSE = 0x20
FLAG_FIRST = 0x40
FLAG_SECOND = 0x80
FLAG_SECONDARY = 0x100


def md_and_nm(read_codes: np.ndarray, ref_codes: np.ndarray):
    """MD:Z string + NM for an ungapped alignment column-by-column."""
    parts = []
    run = 0
    nm = 0
    for rd, rf in zip(read_codes, ref_codes):
        if rd == rf and rd < 4:
            run += 1
        else:
            parts.append(str(run))
            parts.append(bitops.decode_dna(np.array([rf], np.uint8)))
            run = 0
            nm += 1
    parts.append(str(run))
    return "".join(parts), nm


class SamWriter:
    def __init__(self, out, ref_names, ref_lens, cmdline: str = "",
                 no_head: bool = False, rg_id: str = None, rg: list = None):
        self.out = out if hasattr(out, "write") else open(out, "w")
        self.ref_names = ref_names
        self.ref_lens = ref_lens
        self.n_reads = 0
        self.n_unal = 0
        self.n_uniq = 0
        self.n_multi = 0
        if not no_head:
            self.out.write("@HD\tVN:1.0\tSO:unsorted\n")
            for nm, ln in zip(ref_names, ref_lens):
                self.out.write(f"@SQ\tSN:{nm}\tLN:{ln}\n")
            if rg_id:
                self.out.write("@RG\tID:" + rg_id
                               + "".join("\t" + r for r in (rg or [])) + "\n")
            self.out.write(
                "@PG\tID:hisat2-tpu\tPN:hisat2-tpu\tVN:0.1.0"
                + (f"\tCL:\"{cmdline}\"" if cmdline else "") + "\n")

    def write_read(self, name: str, codes: np.ndarray, quals: np.ndarray,
                   alns: list, ref_codes_fn):
        """Write all SAM lines for one read.  alns: list[Alignment] (may be
        empty); ref_codes_fn(joined_pos, span) -> ref codes for MD."""
        self.n_reads += 1
        seq_fw = bitops.decode_dna(codes)
        qual_fw = "".join(chr(int(q) + 33) for q in quals)
        if not alns:
            self.n_unal += 1
            self.out.write(
                f"{name}\t{FLAG_UNMAPPED}\t*\t0\t0\t*\t*\t0\t0\t"
                f"{seq_fw}\t{qual_fw}\tYT:Z:UU\n")
            return
        if alns[0].nh == 1:
            self.n_uniq += 1
        else:
            self.n_multi += 1
        rc_codes = bitops.revcomp_codes(codes)
        for a in alns:
            flag = (FLAG_REVERSE if a.rc else 0) \
                | (FLAG_SECONDARY if a.secondary else 0)
            seq = bitops.decode_dna(rc_codes) if a.rc else seq_fw
            qual = qual_fw[::-1] if a.rc else qual_fw
            L = len(codes)
            rd = rc_codes if a.rc else codes
            ref = ref_codes_fn(a.joined_pos, L)
            md, nm = md_and_nm(rd, ref)
            tags = [f"AS:i:{a.score}",
                    "XN:i:0", f"XM:i:{nm}", "XO:i:0", "XG:i:0",
                    f"NM:i:{nm}", f"MD:Z:{md}", f"NH:i:{a.nh}",
                    "YT:Z:UU"]
            self.out.write(
                f"{name}\t{flag}\t{self.ref_names[a.ref_id]}\t"
                f"{a.ref_pos + 1}\t{a.mapq}\t{L}M\t*\t0\t0\t{seq}\t{qual}\t"
                + "\t".join(tags) + "\n")

    def summary(self) -> str:
        """printAlSumm-equivalent unpaired summary (aln_sink.cpp)."""
        n = max(self.n_reads, 1)
        rate = 100.0 * (self.n_reads - self.n_unal) / n
        return (f"{self.n_reads} reads; of these:\n"
                f"  {self.n_reads} (100.00%) were unpaired; of these:\n"
                f"    {self.n_unal} ({100.0 * self.n_unal / n:.2f}%) "
                f"aligned 0 times\n"
                f"    {self.n_uniq} ({100.0 * self.n_uniq / n:.2f}%) "
                f"aligned exactly 1 time\n"
                f"    {self.n_multi} ({100.0 * self.n_multi / n:.2f}%) "
                f"aligned >1 times\n"
                f"{rate:.2f}% overall alignment rate\n")

    def close(self):
        if self.out not in (None,) and hasattr(self.out, "close"):
            self.out.close()
