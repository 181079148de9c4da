"""Batched partial search: the wavefront equivalent of HI_Aligner::partialSearch.

The reference walks one read at a time right-to-left over the global index,
recording maximal SA-range hits and restarting after each mismatch/empty range
(/root/reference/hi_aligner.h:5434-5678).  Here *all* (read, orientation)
lanes advance one LF step per scan iteration: per-lane state is
(top, bot, lo, rb) plus a fixed-capacity hit list, so the whole search is one
`lax.scan` of length max_read_len with two rank gathers per lane per step.

Semantics per lane, scanning pos = len-1 .. 0:
  - extend current range with read[pos]; if still non-empty, continue;
  - otherwise close the current hit [pos+1, rb) (recorded if it spans
    >= min_hit_len bases) and restart at pos: the new range is the
    single-char range [fchr[c], fchr[c+1]) (so position pos starts the next
    hit), or the full range if read[pos] is N/absent (the char is skipped,
    mirroring partialSearch's N handling).
The hits partition the read into non-overlapping maximal match segments,
exactly like the reference's ReadBWTHit bookkeeping (hi_aligner.h:216-390).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rank as rk


class PartialHits(NamedTuple):
    top: jnp.ndarray    # int32 [B, H]
    bot: jnp.ndarray    # int32 [B, H]
    lo: jnp.ndarray     # int32 [B, H]  leftmost read pos covered
    hi: jnp.ndarray     # int32 [B, H]  one past rightmost read pos covered
    nh: jnp.ndarray     # int32 [B]


def partial_search(bwt_words, occ, fchr, zrow: int, rows: int,
                   reads, lens, max_hits: int = 8,
                   min_hit_len: int = 16) -> PartialHits:
    """reads: int32 [B, L] codes (0-4), left-aligned; lens: int32 [B]."""
    B, L = reads.shape
    H = max_hits

    def step(state, s):
        top, bot, lo, rb, ht, hb, hl, hh, nh = state
        pos = lens - 1 - s                           # [B]
        active = pos >= 0
        c = jnp.take_along_axis(
            reads, jnp.maximum(pos, 0)[:, None], axis=1)[:, 0]
        cc = jnp.minimum(c, 3)
        valid_c = (c < 4) & active
        t2, b2 = rk.lf_range(bwt_words, occ, fchr, zrow, top, bot, cc)
        ok = valid_c & (b2 > t2)
        fail = active & ~ok
        # close current hit [pos+1, rb)
        close = fail & (rb - (pos + 1) >= min_hit_len)
        write = close & (nh < H)
        sel = (jnp.arange(H, dtype=jnp.int32)[None, :] == nh[:, None]) \
            & write[:, None]
        ht = jnp.where(sel, top[:, None], ht)
        hb = jnp.where(sel, bot[:, None], hb)
        hl = jnp.where(sel, (pos + 1)[:, None], hl)
        hh = jnp.where(sel, rb[:, None], hh)
        nh = nh + write.astype(jnp.int32)
        # restart: single-char range if possible, else skip the char
        fc_t = fchr[cc]
        fc_b = fchr[cc + 1]
        re_c = fail & valid_c & (fc_b > fc_t)
        top = jnp.where(ok, t2, jnp.where(re_c, fc_t, np.int32(0)))
        bot = jnp.where(ok, b2, jnp.where(re_c, fc_b, np.int32(rows)))
        rb_new = jnp.where(ok, rb, jnp.where(re_c, pos + 1, pos))
        rb = jnp.where(active, rb_new, rb)
        lo = jnp.where(active, pos, lo)
        top = jnp.where(active, top, state[0])
        bot = jnp.where(active, bot, state[1])
        return (top, bot, lo, rb, ht, hb, hl, hh, nh), None

    z = jnp.zeros((B,), jnp.int32)
    zh = jnp.zeros((B, H), jnp.int32)
    # initial (top, bot) = full range; lo = rb = len (empty hit)
    init = (z, jnp.full((B,), rows, jnp.int32),
            lens.astype(jnp.int32), lens.astype(jnp.int32),
            zh, zh, zh, zh, z)
    (top, bot, lo, rb, ht, hb, hl, hh, nh), _ = jax.lax.scan(
        step, init, jnp.arange(L, dtype=jnp.int32))
    # close the final open hit [lo, rb)
    close = (rb - lo) >= min_hit_len
    write = close & (nh < H)
    sel = (jnp.arange(H, dtype=jnp.int32)[None, :] == nh[:, None]) \
        & write[:, None]
    ht = jnp.where(sel, top[:, None], ht)
    hb = jnp.where(sel, bot[:, None], hb)
    hl = jnp.where(sel, lo[:, None], hl)
    hh = jnp.where(sel, rb[:, None], hh)
    nh = nh + write.astype(jnp.int32)
    return PartialHits(ht, hb, hl, hh, nh)
