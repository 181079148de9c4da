"""Paired-end policy + pair assembly (reference: /root/reference/pe.{h,cpp}
PairedEndPolicy, and HI_Aligner::pairReads, hi_aligner.h:3905-3955).

Given per-mate candidate alignments (already scored), classify pairs:
  concordant (CP): orientations match --fr/--rf/--ff, fragment length within
                   [minins, maxins], same reference
  discordant (DP): both mates align uniquely but violate constraints
  mixed (UP):      mates reported separately
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PairPolicy:
    minins: int = 0          # -I (hisat2.cpp:332)
    maxins: int = 500        # -X (hisat2.cpp:333)
    orient: str = "fr"       # --fr/--rf/--ff
    no_mixed: bool = False
    no_discordant: bool = False

    def concordant(self, a1, a2, len1: int, len2: int):
        """a1, a2: Alignment (mate1, mate2).  Returns (ok, tlen1) where
        tlen1 is the signed TLEN for mate1.  Fragment extents include
        soft-clipped bases (the reference's template-length adjustment,
        on by default; --no-templatelen-adjustment disables it)."""
        if a1.ref_id != a2.ref_id:
            return False, 0
        # determine upstream/downstream by unclipped read-start position
        p1, p2 = a1.joined_pos, a2.joined_pos
        e1, e2 = p1 + len1, p2 + len2
        left_is_1 = (p1 < p2) or (p1 == p2 and e1 <= e2)
        if self.orient == "fr":
            # upstream mate forward, downstream mate reverse-complement
            if left_is_1:
                ok = (not a1.rc) and a2.rc
            else:
                ok = (not a2.rc) and a1.rc
        elif self.orient == "rf":
            if left_is_1:
                ok = a1.rc and (not a2.rc)
            else:
                ok = a2.rc and (not a1.rc)
        else:  # ff: mate1 upstream forward, mate2 downstream forward
            ok = (not a1.rc) and (not a2.rc) and left_is_1
        if not ok:
            return False, 0
        frag = max(e1, e2) - min(p1, p2)
        # containment counts as frag = longer mate (pe.h default allows it)
        if frag < max(self.minins, 1) and self.minins > 0:
            return False, 0
        if frag < self.minins or frag > self.maxins:
            return False, 0
        tlen1 = frag if left_is_1 else -frag
        if p1 == p2 and e1 == e2:
            tlen1 = frag  # leftmost-equal: mate1 positive (SAM convention)
        return True, tlen1


def best_pairs(cands1, cands2, len1, len2, policy: PairPolicy, k: int):
    """Cross candidate lists (small, <= k each) -> sorted concordant pairs.

    Returns list of (a1, a2, tlen1) sorted by pair score desc, position."""
    out = []
    for a1 in cands1:
        for a2 in cands2:
            ok, tlen1 = policy.concordant(a1, a2, len1, len2)
            if ok:
                out.append((a1, a2, tlen1))
    out.sort(key=lambda t: (-(t[0].score + t[1].score),
                            t[0].joined_pos, t[1].joined_pos))
    return out[:k]
