"""SA-range -> genome coordinate resolution (GroupWalk/getOffset equivalent).

The reference resolves each SA row by LF-walking left until it hits a sampled
row (GroupWalk2S, /root/reference/group_walk.h:1436; GFM::getOffset,
gfm.h:2374-2430).  Because our index samples by *text position* (every
2^off_rate-th joined offset is marked), the walk is guaranteed to terminate
within 2^off_rate steps — a static `fori_loop` bound with all lanes walking
in lock-step.  joined offset -> (reference id, ref offset) is a vectorized
binary search over the fragment table (GFM::joinedToTextOff, gfm.h:5076).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rank as rk


def resolve_rows(bwt_words, occ, fchr, mark_words, mark_chk, sa_marked,
                 zrow: int, off_rate: int, row):
    """SA values for each row in `row` (int32 [M]) -> joined offsets [M]."""

    def body(_, st):
        r, steps, done, off = st
        m = rk.is_marked(mark_words, r) & ~done
        idx = rk.mark_rank(mark_words, mark_chk, r)
        off = jnp.where(m, sa_marked[idx] + steps, off)
        done = done | m
        c = rk.bwt_char(bwt_words, r)
        r2 = rk.lf(bwt_words, occ, fchr, zrow, r, c)
        r = jnp.where(done, r, r2)
        steps = steps + (~done).astype(jnp.int32)
        return r, steps, done, off

    M = row.shape[0]
    st = (row.astype(jnp.int32), jnp.zeros((M,), jnp.int32),
          jnp.zeros((M,), bool), jnp.zeros((M,), jnp.int32))
    _, _, done, off = jax.lax.fori_loop(0, (1 << off_rate) + 1, body, st)
    return off


def joined_to_ref(frag_joined, frag_ref, frag_off, pos, span):
    """Map joined [pos, pos+span) -> (ref_id, ref_offset, in_bounds).

    in_bounds is False when the interval crosses a fragment boundary (the
    joined text concatenates fragments with nothing between them, so a hit
    spanning two fragments is bogus — same check as the reference's
    straddled logic in joinedToTextOff)."""
    f = jnp.searchsorted(frag_joined, pos, side="right") - 1
    f = jnp.clip(f, 0, frag_ref.shape[0] - 1)
    ok = (pos >= frag_joined[f]) & (pos + span <= frag_joined[f + 1])
    return frag_ref[f], frag_off[f] + (pos - frag_joined[f]), ok
