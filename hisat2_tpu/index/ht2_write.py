"""Writer for the reference's `.ht2` index format (linear FM indexes).

Emits a `.1`-`.8` set that is byte-identical to what `hisat2-build-s`
produces for the same FASTA (no-ALT, forward index), so the reference
aligner can run against indexes built by this package — the strongest
available builder-correctness oracle.

Layout authority (all in /root/reference/):
  - .1/.2 header + stream: GFM::writeFromMemory (gfm.h:6143-6227),
    linear GFM::buildToDisk (gfm.h:4704-5075), names tail
    (gfm.h:1999-2004), szsToDisk (gfm.h:1175, impl ~5410).
  - .3/.4: BitPairReference::szsFromFasta / ctor (reference.cpp).
  - .5/.6: HGFM prelude (hgfm.h:2157-2166) + LocalGFM ctor stream
    (hgfm.h:190-240) + LocalGFM::buildToDisk (hgfm.h:690-1100),
    index_t = uint16, full_index_t = uint32.
  - .7/.8: empty ALT/haplotype/name lists (gfm.h:1276-1310).

Geometry constants follow hisat2-build-s defaults: global lineRate 6 /
offRate 4 / ftabChars 10; local lineRate 6 / offRate 3 / ftabChars 6,
window 57,344 bp advancing 56,320 bp (hier_idx_common.h:24-41).
"""

from __future__ import annotations

import numpy as np

from .builder import suffix_array

VERSION = 33619968          # 2.1.0's version word, observed in built .ht2
GLOBAL_LINE_RATE = 6
GLOBAL_OFF_RATE = 4
GLOBAL_FTAB_CHARS = 10
LOCAL_LINE_RATE = 6
LOCAL_OFF_RATE = 3
LOCAL_FTAB_CHARS = 6
LOCAL_SIZE = 57344
LOCAL_INTERVAL = 56320


def _u32(*vals):
    return np.asarray(vals, "<u4").tobytes()


def _i32(*vals):
    return np.asarray(vals, "<i4").tobytes()


def _records(codes: np.ndarray):
    """RefRecords (off = leading non-ACGT run, len = ACGT stretch) for
    one sequence, ref_read.h:94-103 semantics."""
    isn = codes > 3
    recs = []
    i, n = 0, len(codes)
    first = True
    while i < n:
        j = i
        while j < n and isn[j]:
            j += 1
        k = j
        while k < n and not isn[k]:
            k += 1
        if k > j or first:
            recs.append((j - i, k - j, first))
            first = False
        i = k
    if not recs:
        recs.append((0, 0, True))
    return recs


def _pack_2bit_lsb(codes: np.ndarray) -> np.ndarray:
    """4 bp/byte, base i at bits 2i (LSB-first), zero padded."""
    n = len(codes)
    pad = (-n) % 4
    c = np.concatenate([codes.astype(np.uint8),
                        np.zeros(pad, np.uint8)]).reshape(-1, 4)
    return (c[:, 0] | (c[:, 1] << 2) | (c[:, 2] << 4)
            | (c[:, 3] << 6)).astype(np.uint8)


def _fm_stream(text: np.ndarray, line_rate: int, off_rate: int,
               ftab_chars: int, dtype):
    """The linear buildToDisk stream pieces for `text` (uint8 codes 0-3):
    returns (sides bytes, zoff, fchr[5], ftab, eftab, offs) with
    index-typed arrays in `dtype` (gfm.h:4704-5075)."""
    text = np.ascontiguousarray(text, np.uint8)
    n = len(text)
    # The reference's blockwise SA sorts with the terminal sentinel as
    # the LARGEST character (the '$' suffix lands in the last row).
    # Equivalent: SA of the complemented text with a smallest sentinel,
    # reversed (verified offs-identical vs hisat2-build-s output).
    sa = suffix_array((3 - text).astype(np.uint8))[::-1].astype(np.int64)
    gbwt_len = n + 1
    # BWT chars; the '$' row (saElt == 0) is written as 'A' but not
    # counted (gfm.h:4816-4827)
    bwt = np.where(sa > 0, text[np.maximum(sa - 1, 0)], 0).astype(np.uint8)
    zoff = int(np.flatnonzero(sa == 0)[0])
    counted = np.ones(gbwt_len, bool)
    counted[zoff] = False

    side_sz = 1 << line_rate
    isz = np.dtype(dtype).itemsize
    side_gbwt = side_sz - 4 * isz               # bytes of 2-bit chars/side
    chars_per_side = side_gbwt * 4
    n_sides = (n // 4 + 1 + side_gbwt - 1) // side_gbwt
    tot_chars = n_sides * chars_per_side
    # pad rows beyond the SA with 'A', counted in occ (gfm.h:4875-4885)
    chars = np.zeros(tot_chars, np.uint8)
    chars[:gbwt_len] = bwt
    cflag = np.zeros(tot_chars, bool)
    cflag[:gbwt_len] = counted
    cflag[gbwt_len:] = True
    # occ totals at each side START (occSave, gfm.h:4918-4931)
    per_side = (chars.reshape(n_sides, chars_per_side)[:, :, None]
                == np.arange(4)[None, None, :])
    per_side &= cflag.reshape(n_sides, chars_per_side)[:, :, None]
    side_tot = per_side.sum(axis=1, dtype=np.int64)
    occ_start = np.zeros((n_sides, 4), np.int64)
    occ_start[1:] = np.cumsum(side_tot, axis=0)[:-1]
    packed = _pack_2bit_lsb(chars).reshape(n_sides, side_gbwt)
    sides = np.zeros((n_sides, side_sz), np.uint8)
    sides[:, :side_gbwt] = packed
    sides[:, side_gbwt:] = occ_start.astype(dtype).view(np.uint8) \
        .reshape(n_sides, 4 * isz)

    # fchr: cumulative char counts, shifted (gfm.h:4962-4977)
    cnt = np.bincount(text, minlength=4)[:4]
    fchr = np.zeros(5, np.int64)
    fchr[1:] = np.cumsum(cnt)

    # ftab histogram + absorb (gfm.h:4833-4867): walk rows in SA order
    ftab_len = (1 << (2 * ftab_chars)) + 1
    ftab = np.zeros(ftab_len, np.int64)
    long_mask = (n - sa) >= ftab_chars
    # sufInt: first ftab_chars chars of each long suffix, MSB-first
    li = np.flatnonzero(long_mask)
    if li.size:
        starts = sa[li]
        idx = starts[:, None] + np.arange(ftab_chars)[None, :]
        sufints = np.zeros(li.size, np.int64)
        cs = text[idx.reshape(-1)].reshape(li.size, ftab_chars)
        for k in range(ftab_chars):
            sufints = (sufints << 2) | cs[:, k]
        np.add.at(ftab, sufints + 1, 1)
    # absorb: short suffixes between long ones attach to the NEXT long
    # suffix's sufInt (or the final ftab slot)
    absorb = np.zeros(ftab_len, np.int64)
    short_rows = np.flatnonzero(~long_mask)
    if short_rows.size and li.size:
        # for each run of consecutive short rows, find following long row
        nxt = np.searchsorted(li, short_rows)
        trailing = nxt >= li.size
        valid = ~trailing
        if valid.any():
            tgt = sufints[nxt[valid]]
            np.add.at(absorb, tgt, 1)
        if trailing.any():
            absorb[ftab_len - 1] += int(trailing.sum())
    elif short_rows.size:
        absorb[ftab_len - 1] += short_rows.size

    # prefix-sum with eftab insertion (gfm.h:4986-5034)
    eftab_len = ftab_chars * 2
    eftab = np.zeros(eftab_len, np.int64)
    off_mask_val = (1 << (8 * isz)) - 1          # OFF_MASK for this width
    out_ftab = np.zeros(ftab_len, np.int64)
    eftab_cur = 0
    hi_prev = 0                                  # ftabHi(i-1), starts 0
    for i in range(1, ftab_len):
        lo = ftab[i] + hi_prev
        if absorb[i] > 0:
            hi = lo + absorb[i]
            eftab[eftab_cur * 2] = lo
            eftab[eftab_cur * 2 + 1] = hi
            out_ftab[i] = eftab_cur ^ off_mask_val
            eftab_cur += 1
            hi_prev = hi
        else:
            out_ftab[i] = lo
            hi_prev = lo

    offs = sa[:: 1 << off_rate]
    return (sides.tobytes(), zoff, fchr, out_ftab, eftab, offs)


def _szs_bytes(recs, dtype):
    """szsToDisk (gfm.h:5410-5436): (joined off, seq id, seq off) per
    nonzero-len record."""
    out = []
    seq = -1
    off = 0
    totlen = 0
    for roff, rlen, first in recs:
        if rlen == 0:
            continue
        if first:
            off = 0
            seq += 1
        off += roff
        out.extend([totlen, seq, off])
        totlen += rlen
        off += rlen
    return np.asarray(out, dtype).tobytes(), len(out) // 3


def export_ht2(seqs, base: str):
    """Write `<base>.{1..8}.ht2` for `seqs` = [(name, codes uint8 0-4)].

    Linear (no-ALT) forward index, byte-compatible with
    `hisat2-build-s <fasta> <base>`."""
    names = [nm for nm, _ in seqs]
    codes_list = [np.asarray(c, np.uint8) for _, c in seqs]
    plens = [len(c) for c in codes_list]
    all_recs = []
    for i, c in enumerate(codes_list):
        for roff, rlen, first in _records(c):
            all_recs.append((roff, rlen, first))
    joined = np.concatenate(
        [c[c <= 3] for c in codes_list]) if codes_list else \
        np.zeros(0, np.uint8)
    n = len(joined)

    sides, zoff, fchr, ftab, eftab, offs = _fm_stream(
        joined, GLOBAL_LINE_RATE, GLOBAL_OFF_RATE, GLOBAL_FTAB_CHARS,
        "<u4")
    rstarts, n_frag = _szs_bytes(all_recs, "<u4")

    flags = 1
    with open(base + ".1.ht2", "wb") as f1:
        f1.write(_i32(1))                        # endian
        f1.write(_i32(VERSION))
        f1.write(_u32(n))                        # len
        f1.write(_u32(n + 1))                    # gbwtLen (patched value)
        f1.write(_u32(n + 1))                    # numNodes
        f1.write(_i32(GLOBAL_LINE_RATE, 2, GLOBAL_OFF_RATE,
                      GLOBAL_FTAB_CHARS))
        f1.write(_u32(GLOBAL_FTAB_CHARS * 2))    # eftabLen (patched)
        f1.write(_i32(-flags))
        f1.write(_u32(len(names)))
        f1.write(np.asarray(plens, "<u4").tobytes())
        f1.write(_u32(n_frag))
        f1.write(rstarts)
        f1.write(sides)
        f1.write(_u32(1, zoff))                  # zOffs
        f1.write(fchr.astype("<u4").tobytes())
        f1.write(ftab.astype("<u4").tobytes())
        f1.write(eftab.astype("<u4").tobytes())
        for nm in names:
            f1.write(nm.encode() + b"\n")
        f1.write(b"\x00")
    with open(base + ".2.ht2", "wb") as f2:
        f2.write(_i32(1))
        f2.write(offs.astype("<u4").tobytes())

    # .3/.4: RefRecords + 2-bit packed N-free stream
    with open(base + ".3.ht2", "wb") as f3:
        f3.write(_i32(1))
        f3.write(_u32(len(all_recs)))
        for roff, rlen, first in all_recs:
            f3.write(_u32(roff, rlen))
            f3.write(bytes([1 if first else 0]))
    with open(base + ".4.ht2", "wb") as f4:
        f4.write(_pack_2bit_lsb(joined).tobytes())

    # .5/.6: local FM indexes (HGFM prelude + one LocalGFM per window)
    _write_locals(base, codes_list, plens)

    # .7/.8: empty ALT database
    with open(base + ".7.ht2", "wb") as f7:
        f7.write(_i32(1) + _u32(0, 0))
    with open(base + ".8.ht2", "wb") as f8:
        f8.write(_i32(1) + _u32(0))


def _write_locals(base: str, codes_list, plens):
    n_local = sum((pl + LOCAL_INTERVAL - 1) // LOCAL_INTERVAL
                  for pl in plens)
    f5 = open(base + ".5.ht2", "wb")
    f6 = open(base + ".6.ht2", "wb")
    f5.write(_i32(1))
    f6.write(_i32(1))
    f5.write(_u32(n_local))
    f5.write(_i32(LOCAL_LINE_RATE, 2, LOCAL_OFF_RATE, LOCAL_FTAB_CHARS))
    f5.write(_i32(-1))                           # -flags
    joined_before = 0          # N-free joined offset, GLOBAL across seqs
    for tidx, codes in enumerate(codes_list):
        pl = plens[tidx]
        local_off = 0
        while local_off < pl:
            wlen = min(pl - local_off, LOCAL_SIZE)
            window = codes[local_off:local_off + wlen]
            recs = _records(window)
            text = window[window <= 3]
            # the next window starts LOCAL_INTERVAL later; its joined
            # offset advances by the N-free length of the interval part
            interval_part = codes[local_off:local_off + LOCAL_INTERVAL]
            f5.write(_u32(tidx, local_off, joined_before))
            joined_before += int((interval_part <= 3).sum())
            local_off += LOCAL_INTERVAL

            u2 = lambda *v: np.asarray(v, "<u2").tobytes()
            if len(text) == 0:
                # empty (all-N) window: header fields only (hgfm.h:198)
                f5.write(u2(0, 0, 0, 0))
                continue
            sides, zoff, fchr, ftab, eftab, offs = _fm_stream(
                text, LOCAL_LINE_RATE, LOCAL_OFF_RATE, LOCAL_FTAB_CHARS,
                "<u2")
            rstarts, n_frag = _szs_bytes(recs, "<u2")
            f5.write(u2(len(text)))              # gh._len
            f5.write(u2(len(text) + 1))          # gbwtLen (patched)
            f5.write(u2(len(text) + 1))          # numNodes
            f5.write(u2(LOCAL_FTAB_CHARS * 2))   # eftabLen
            f5.write(u2(1))                      # nPat
            f5.write(u2(wlen))                   # plen (with Ns)
            f5.write(u2(n_frag))
            f5.write(rstarts)
            f5.write(sides)
            f5.write(u2(1, zoff))
            f5.write(fchr.astype("<u2").tobytes())
            f5.write(ftab.astype("<u2").tobytes())
            f5.write(eftab.astype("<u2").tobytes())
            f6.write(offs.astype("<u2").tobytes())
    f5.write(b"\x00")
    f5.close()
    f6.close()
