"""Batched ungapped extension + scoring over the packed reference.

TPU-native reshaping of GenomeHit::extend / alignWithALTs_recur
(/root/reference/hi_aligner.h:1891-3377): instead of a per-read recursive
byte-compare against BitPairReference::getStretch, every candidate
(read lane, genome start) becomes one vector lane; the whole read is gathered
from the 2-bit reference and compared in one fused pass, with
quality-dependent mismatch penalties (Scoring::mm, scoring.h:294) and the
constant N penalty applied elementwise.

Soft-clipping: HISAT2 end-to-end alignments may trim either end with a
per-base penalty (GenomeHit::calculateScore, hi_aligner.h:3695-3702;
Scoring::sc, scoring.h:312-318).  Penalty minimization over (trim5, trim3)
decomposes into two independent prefix/suffix maximizations of
gain[j] = column_penalty[j] - clip_cost[j], solved with cumulative sums +
argmax per lane — no search loop.  Reference quirk replicated: the trim3
clip cost also indexes quality from the *start* of the read
(hi_aligner.h:3700-3702 uses qual[i] for i < _trim3).

ALT (SNP/indel) branching and spliced joins layer on top (align/graph,
align/splice).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import rank as rk

_OOB_PEN = 100000  # out-of-text column: forces the optimizer to clip it


class ExtendResult(NamedTuple):
    score: jnp.ndarray    # int32 [M] total score (<= 0), after best clipping
    n_mm: jnp.ndarray     # int32 [M] mismatches within the aligned region
    n_n: jnp.ndarray      # int32 [M] read-N columns within the aligned region
    clip_l: jnp.ndarray   # int32 [M] bases soft-clipped at read start (trim5)
    clip_r: jnp.ndarray   # int32 [M] bases soft-clipped at read end (trim3)
    ok: jnp.ndarray       # bool  [M] aligned region non-empty and in-text


def extend_ungapped(ref_words, n_text: int, reads, quals, lens,
                    cand_lane, cand_start, mm_pen, clip_pen, n_pen: int,
                    allow_softclip: bool = True):
    """Score full-length (optionally end-clipped) ungapped alignments.

    reads: int32 [B, L]; quals: int32 [B, L] (0-63); lens: int32 [B]
    cand_lane: int32 [M] indexes into reads; cand_start: int32 [M] joined pos
    mm_pen / clip_pen: int32 [64] per-quality penalty tables.
    """
    L = reads.shape[1]
    rd = reads[cand_lane]                                     # [M, L]
    q = jnp.minimum(quals[cand_lane], 63)
    ln = lens[cand_lane]                                      # [M]
    col = jnp.arange(L, dtype=jnp.int32)[None, :]
    pos = cand_start[:, None] + col
    vp = col < ln[:, None]
    oob = vp & ((pos < 0) | (pos >= n_text))
    rc = rk.ref_char(ref_words, jnp.clip(pos, 0, n_text - 1))
    isn = vp & (rd >= 4)
    mm = vp & (rd < 4) & (rd != rc) & ~oob
    pen = (jnp.where(mm, mm_pen[q], 0)
           + jnp.where(isn, jnp.int32(n_pen), 0)
           + jnp.where(oob, jnp.int32(_OOB_PEN), 0))
    total_pen = pen.sum(axis=1)

    if allow_softclip:
        ccost = jnp.where(vp, clip_pen[q], 0)
        M = pen.shape[0]
        zeros = jnp.zeros((M, 1), jnp.int32)
        # prefix penalty sums: P[a] = sum(pen[:a]); cost prefix: C[a]
        P = jnp.concatenate([zeros, jnp.cumsum(pen, axis=1)], axis=1)
        C = jnp.concatenate([zeros, jnp.cumsum(ccost, axis=1)], axis=1)
        brange = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
        in_read = brange <= ln[:, None]
        # left clip of a columns gains P[a] - C[a]
        lgs = jnp.where(in_read, P - C, -1)
        clip_l = jnp.argmax(lgs, axis=1).astype(jnp.int32)
        gl = jnp.take_along_axis(lgs, clip_l[:, None], 1)[:, 0]
        # right clip of b columns gains (P[len] - P[len-b]) - C[b]:
        # the trim3 clip COST uses quality of the first b columns —
        # replicating hi_aligner.h:3700-3702 exactly
        p_at = jnp.take_along_axis(
            P, jnp.maximum(ln[:, None] - brange, 0), 1)
        p_len = jnp.take_along_axis(P, ln[:, None], 1)
        rgs = jnp.where(in_read, p_len - p_at - C, -1)
        clip_r = jnp.argmax(rgs, axis=1).astype(jnp.int32)
        gr = jnp.take_along_axis(rgs, clip_r[:, None], 1)[:, 0]
        gl = jnp.maximum(gl, 0)
        gr = jnp.maximum(gr, 0)
        clip_l = jnp.where(gl > 0, clip_l, 0)
        clip_r = jnp.where(gr > 0, clip_r, 0)
        score = -(total_pen - gl - gr)
        ok = (clip_l + clip_r) < ln
    else:
        clip_l = jnp.zeros_like(ln)
        clip_r = jnp.zeros_like(ln)
        score = -total_pen
        ok = jnp.ones_like(ln, dtype=bool)
    ok &= (cand_start >= 0)
    ok &= score > -_OOB_PEN // 2
    # aligned-region mismatch counts for reporting
    keep = (col >= clip_l[:, None]) & (col < (ln - clip_r)[:, None])
    return ExtendResult(score.astype(jnp.int32),
                        (mm & keep).sum(axis=1).astype(jnp.int32),
                        (isn & keep).sum(axis=1).astype(jnp.int32),
                        clip_l, clip_r, ok)
