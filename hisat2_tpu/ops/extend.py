"""Batched ungapped extension + scoring over the packed reference.

TPU-native reshaping of GenomeHit::extend / alignWithALTs_recur
(/root/reference/hi_aligner.h:1891-3377): instead of a per-read recursive
byte-compare against BitPairReference::getStretch, every candidate
(read lane, genome start) becomes one vector lane; the whole read is gathered
from the 2-bit reference and compared in one fused pass, with
quality-dependent mismatch penalties (Scoring::mm, scoring.h:294) and the
constant N penalty applied elementwise.  ALT (SNP/indel) branching and
spliced joins layer on top (align/graph, align/splice).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import rank as rk


class ExtendResult(NamedTuple):
    score: jnp.ndarray    # int32 [M] total penalty-based score (<= 0)
    n_mm: jnp.ndarray     # int32 [M] mismatches (excluding read Ns)
    n_n: jnp.ndarray      # int32 [M] read-N columns
    ok: jnp.ndarray       # bool  [M] fully inside the joined text


def extend_ungapped(ref_words, n_text: int, reads, quals, lens,
                    cand_lane, cand_start, mm_pen, n_pen: int):
    """Score full-length ungapped alignment of each candidate.

    reads: int32 [B, L]; quals: int32 [B, L] (0-63); lens: int32 [B]
    cand_lane: int32 [M] indexes into reads; cand_start: int32 [M] joined pos
    mm_pen: int32 [64] penalty table.
    """
    L = reads.shape[1]
    rd = reads[cand_lane]                                     # [M, L]
    q = jnp.minimum(quals[cand_lane], 63)
    ln = lens[cand_lane]                                      # [M]
    col = jnp.arange(L, dtype=jnp.int32)[None, :]
    pos = cand_start[:, None] + col
    vp = col < ln[:, None]
    inb = (pos >= 0) & (pos < n_text)
    rc = rk.ref_char(ref_words, jnp.clip(pos, 0, n_text - 1))
    isn = vp & (rd >= 4)
    mm = vp & (rd < 4) & (rd != rc)
    pen = (jnp.where(mm, mm_pen[q], 0)
           + jnp.where(isn, jnp.int32(n_pen), 0))
    score = -pen.sum(axis=1)
    ok = (vp & ~inb).sum(axis=1) == 0
    ok &= (cand_start >= 0)
    return ExtendResult(score.astype(jnp.int32),
                        mm.sum(axis=1).astype(jnp.int32),
                        isn.sum(axis=1).astype(jnp.int32), ok)
