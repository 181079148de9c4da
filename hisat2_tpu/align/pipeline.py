"""End-to-end batched alignment pipeline (driver + device step).

This is the TPU-native equivalent of the reference's per-thread worker loop
(multiseedSearchWorker_hisat2, /root/reference/hisat2.cpp:3051-3520) and
HI_Aligner::go (hi_aligner.h:3874): instead of one read per thread iterating
search->resolve->extend with data-dependent control flow, a whole batch of
reads (x2 orientations) runs each stage as one fused device computation:

  encode batch -> [device] partial_search (wavefront LF)
               -> [device] resolve rows -> joined offsets
               -> [device] ungapped extension scoring
               -> [host]   dedup / select<=k / MAPQ / SAM fields

Selection semantics follow AlnSinkWrap::finishRead (aln_sink.h:1054-1360):
up to k alignments sorted by score (deterministic tie-break by coordinate),
NH = number reported, secondary flag on all but the first, MAPQ from
best/secbest via mapq.mapq_v2.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..index.format import FMIndex
from ..ops import extend as extend_ops
from ..ops import resolve as resolve_ops
from ..ops import search as search_ops
from ..ops import splice as splice_ops
from ..utils import bitops
from . import mapq as mapq_mod
from .scoring import Scoring


@dataclasses.dataclass
class Alignment:
    """One reported alignment (AlnRes equivalent, aligner_result.h).

    Junction fields describe at most one splice/indel join (combineWith
    product, hi_aligner.h:1286): the read splits at `junc_x` (first read
    base of the right segment); `junc_len` is the reference skip (intron or
    deletion length; negative = insertion length); `spl_dir` is the
    SPL_FW/RC/SEMI_* classification driving the XS:A tag."""
    read_idx: int
    rc: bool              # reverse-complement orientation
    ref_id: int
    ref_pos: int          # 0-based ref position of the first ALIGNED base
    joined_pos: int       # joined position of the (unclipped) read start
    clip_l: int           # soft-clipped bases at alignment start (trim5)
    clip_r: int           # soft-clipped bases at alignment end (trim3)
    aln_span: int         # aligned reference span (incl. intron/del skip)
    score: int
    n_mm: int
    n_n: int
    mapq: int
    nh: int
    secondary: bool
    zs: Optional[int] = None   # secbest score (SAM ZS:i), when one exists
    junc_kind: int = 0         # 0 none, 1 splice (N), 2 deletion, 3 insertion
    junc_x: int = 0            # read pos of the right segment's first base
    junc_len: int = 0          # REFERENCE-space skip (>0 N/D; <0 insertion;
                               #   may exceed the joined gap across N runs)
    junc_d2: int = 0           # joined diagonal of the right segment
    spl_dir: int = 0           # splice_ops.SPL_*
    junc_known: bool = False   # known splice site / known ALT indel

    @property
    def aln_start(self) -> int:
        """Joined position of the first aligned base."""
        return self.joined_pos + self.clip_l


@dataclasses.dataclass
class BatchResult:
    alignments: list          # list[list[Alignment]] per read
    n_reads: int

    @property
    def n_aligned(self):
        return sum(1 for a in self.alignments if a)

    @property
    def n_unique(self):
        return sum(1 for a in self.alignments if a and a[0].nh == 1)

    @property
    def n_multi(self):
        return sum(1 for a in self.alignments if a and a[0].nh > 1)


class TPUAligner:
    """Holds the device-resident index + jitted batch step."""

    def __init__(self, index: FMIndex, scoring: Optional[Scoring] = None,
                 k: int = 5, max_hits: int = 4, min_hit_len: int = 16,
                 cand_per_hit: int = 4, no_fw: bool = False,
                 no_rc: bool = False, variants=None, spliced: bool = False,
                 max_pairs: int = 4, splice_db=None, ss_slots: int = 2):
        self.meta = index.meta
        self.scoring = scoring or Scoring()
        self.k = k
        self.max_hits = max_hits
        # spliced mode records short boundary anchors (>= 8 bp, the
        # reference's _minK_local — hi_aligner.h:3813) so the junction sweep
        # can pair a long anchor with a short one across an intron
        self.min_hit_len = 8 if spliced else min_hit_len
        self.cand_per_hit = cand_per_hit
        # unique candidates extended per (read, orientation); >= k so that
        # -k reporting isn't starved, small so extension stays cheap
        self.max_cands = max(k + 1, 6)
        self.no_fw = no_fw
        self.no_rc = no_rc
        self.spliced = spliced
        self.max_pairs = max_pairs
        self.dev = index.to_device()
        # host copies for SAM field generation (MD/ref lookup)
        self.ref_codes = bitops.unpack_2bit(
            np.asarray(index.ref_words), index.meta.n)
        self.frag_joined = np.asarray(index.frag_joined)
        self.frag_ref = np.asarray(index.frag_ref)
        self.frag_off = np.asarray(index.frag_off)
        # replicated small parameter arrays: jit ARGUMENTS, never closures
        # (see ops/rank.py perf rule)
        self.params = {
            "mm_pen": jnp.asarray(self.scoring.mm_pen_table()),
            "clip_pen": jnp.asarray(self.scoring.clip_pen_table()),
        }
        # variant (ALT) database -> device planes + host Zs lookup tables
        self.variants = variants
        if variants is not None and variants.n_snps:
            from ..index.graph import build_graph_arrays
            self.graph = build_graph_arrays(index, variants)
            self.params["snv1"] = jnp.asarray(self.graph.snv_delta1)
            self.params["snv2"] = jnp.asarray(self.graph.snv_delta2)
        else:
            self.graph = None
            self.params["snv1"] = jnp.zeros(1, jnp.uint32)
            self.params["snv2"] = jnp.zeros(1, jnp.uint32)
        self.splice_params = splice_ops.SpliceParams(
            min_intron=self.scoring.min_intron_len,
            max_intron=self.scoring.max_intron_len,
            pen_can=self.scoring.pen_can_splice,
            pen_noncan=self.scoring.pen_noncan_splice,
            rd_gap_open=self.scoring.rd_gap_open,
            rd_gap_ext=self.scoring.rd_gap_ext,
            rf_gap_open=self.scoring.rf_gap_open,
            rf_gap_ext=self.scoring.rf_gap_ext)
        if spliced:
            td, ta1, ta2 = splice_ops.junction_prob_tables()
            self.params["tab_donor"] = jnp.asarray(td)
            self.params["tab_acc1"] = jnp.asarray(ta1)
            self.params["tab_acc2"] = jnp.asarray(ta2)
            from .splice_db import SpliceSiteDB
            self.splice_db = (splice_db if splice_db is not None
                              else SpliceSiteDB(index))
            if variants is not None and len(variants.ss_ref):
                self.splice_db.add_from_variants(variants)
        else:
            self.splice_db = None
        self.ss_slots = ss_slots
        self._device_step = jax.jit(self._align_device)

    # ------------------------------------------------------------------
    def _align_device(self, d, params, reads, quals, lens, minsc,
                      rdids=None, ss=None):
        """Device computation for one batch: [B, L] -> candidate dict.

        Lanes 0..B-1 are forward, B..2B-1 reverse-complement.

        NOTE: the index bundle `d` and the `params` dict are jit ARGUMENTS,
        not closures — closed-over device arrays embed as executable
        constants, which the runtime handles ~50x slower per op (see
        ops/rank.py)."""
        meta = self.meta
        B, L = reads.shape
        col = jnp.arange(L, dtype=jnp.int32)[None, :]
        idxr = lens[:, None] - 1 - col
        ok = idxr >= 0
        g = jnp.take_along_axis(reads, jnp.maximum(idxr, 0), axis=1)
        rc = jnp.where(ok & (g < 4), 3 - g, jnp.int32(4))
        qr = jnp.where(ok, jnp.take_along_axis(
            quals, jnp.maximum(idxr, 0), axis=1), 0)
        ar = jnp.concatenate([reads, rc]).astype(jnp.int32)
        aq = jnp.concatenate([quals, qr]).astype(jnp.int32)
        al = jnp.concatenate([lens, lens]).astype(jnp.int32)
        am = jnp.concatenate([minsc, minsc]).astype(jnp.int32)

        hits = search_ops.partial_search(
            d.bwt_words, d.occ, d.fchr, meta.zrow, meta.rows, ar, al,
            self.max_hits, self.min_hit_len)

        H, P = self.max_hits, self.cand_per_hit
        w = hits.bot - hits.top                                   # [2B, H]
        hv = jnp.arange(H, dtype=jnp.int32)[None, :] < hits.nh[:, None]
        j = jnp.arange(P, dtype=jnp.int32)
        rowm = hits.top[:, :, None] + j[None, None, :]            # [2B,H,P]
        cval = hv[:, :, None] & (j[None, None, :] < w[:, :, None])
        rows_flat = jnp.where(cval, rowm, 0).reshape(-1)
        offs = resolve_ops.resolve_rows(
            d.bwt_words, d.occ, d.fchr, d.mark_words, d.mark_chk,
            d.sa_marked, meta.zrow, meta.off_rate, rows_flat)
        lo = hits.lo[:, :, None]                                  # [2B,H,1]
        starts = (offs.reshape(2 * B, H, P) - lo).reshape(2 * B, H * P)
        cv = cval.reshape(2 * B, H * P)
        # device-side dedup + compaction: different anchors of the same read
        # resolve to the same genome start, so most of the H*P slots are
        # duplicates or invalid.  Sort per lane, mark uniques, compact the
        # unique starts into the first C slots — the extension then runs on
        # a 16/C-times smaller candidate matrix.
        BIG = np.int32(2**30)
        key = jnp.where(cv, starts, BIG)
        skey = jnp.sort(key, axis=1)
        uniq = (skey != BIG) & jnp.concatenate(
            [jnp.ones((2 * B, 1), bool), skey[:, 1:] != skey[:, :-1]], axis=1)
        C = self.max_cands
        comp = jnp.argsort(~uniq, axis=1, stable=True)[:, :C]
        cstart = jnp.take_along_axis(skey, comp, axis=1)          # [2B, C]
        cvalid = jnp.take_along_axis(uniq, comp, axis=1)
        if self.spliced:
            # anchor length per compact candidate: short (8-15 bp) anchors
            # feed ONLY the junction sweep, not ungapped reporting (the
            # reference uses them solely inside hybridSearch recombination)
            hlen = (hits.hi - hits.lo)[:, :, None]                # [2B,H,1]
            hlen_flat = jnp.broadcast_to(
                hlen, (2 * B, H, P)).reshape(2 * B, H * P)
            same = cstart[:, :, None] == starts[:, None, :]       # [2B,C,HP]
            same &= cv[:, None, :]
            clen = jnp.where(same, hlen_flat[:, None, :], 0).max(axis=2)
            cvalid_long = cvalid & (clen >= 16)
        else:
            cvalid_long = cvalid
        planes = extend_ops.pen_planes(
            d.ref_words, meta.n, ar, aq, al,
            jnp.where(cvalid, cstart, -1), params["mm_pen"],
            self.scoring.n_pen,
            snv_delta1=params["snv1"] if self.graph is not None else None,
            snv_delta2=params["snv2"] if self.graph is not None else None)
        ext = extend_ops.extend_grouped(
            d.ref_words, meta.n, ar, aq, al,
            jnp.where(cvalid, cstart, -1), params["mm_pen"],
            params["clip_pen"], self.scoring.n_pen,
            allow_softclip=not self.scoring.no_softclip,
            planes=planes)
        out = {"starts": cstart, "score": ext.score, "n_mm": ext.n_mm,
               "n_n": ext.n_n, "clip_l": ext.clip_l, "clip_r": ext.clip_r,
               "valid": cvalid_long & ext.ok, "alt_score": ext.alt_score}
        if self.spliced:
            ch = splice_ops.diag_chars(
                d.ref_words, meta.n, cstart, L, 16)
            res = splice_ops.pair_sweep(
                ch, planes.pen_raw, planes.pen, planes.mm_raw,
                cstart, cvalid, al, am,
                (params["tab_donor"], params["tab_acc1"],
                 params["tab_acc2"]),
                self.splice_params)
            sel = splice_ops.select_pairs(res, cstart, top=self.max_pairs)
            # known/temp splice-site injection
            rd2 = jnp.concatenate([rdids, rdids]).astype(jnp.int32)
            C = cstart.shape[1]
            zero3 = jnp.zeros((2 * B, C, 1), jnp.int32)
            P_raw = jnp.concatenate(
                [zero3, jnp.cumsum(planes.pen_raw, axis=2)], axis=2)
            Pm = jnp.concatenate(
                [zero3, jnp.cumsum(planes.mm_raw.astype(jnp.int32), axis=2)],
                axis=2)
            al3 = jnp.broadcast_to(al[:, None, None], (2 * B, C, 1))
            tot_raw = jnp.take_along_axis(P_raw, al3, axis=2)[:, :, 0]
            tot_m = jnp.take_along_axis(Pm, al3, axis=2)[:, :, 0]
            inj = splice_ops.inject_known(
                d.ref_words, meta.n, ar, aq, al, rd2,
                cstart, cvalid, P_raw, tot_raw, Pm, tot_m,
                ss["ss_kd"], ss["ss_ka"], ss["ss_rdid"],
                ss["ss_ka_s"], ss["ss_kd_s"], ss["ss_rdid_a"],
                params["mm_pen"], self.scoring.n_pen, am,
                slots=self.ss_slots)
            J = inj["score"].shape[1]
            for k2 in ("score", "d1", "d2", "x", "kind", "spldir",
                       "splscore"):
                out["p_" + k2] = jnp.concatenate(
                    [sel[k2], inj[k2]], axis=1)
            out["p_known"] = jnp.concatenate(
                [jnp.zeros((2 * B, self.max_pairs), jnp.int32),
                 jnp.ones((2 * B, J), jnp.int32)], axis=1)
        return out

    # ------------------------------------------------------------------
    def annotate_snps(self, a, rd_aligned):
        """(Zs:Z string, offsets of SNP-matched columns) for one alignment.

        The offsets are excluded from NM/XM, mirroring how the reference
        marks snpID edits and skips them in mismatch accounting
        (aligner_result.cpp NM computation; sam.h:978 Zs emission)."""
        if self.graph is None:
            return None, ()
        g = self.graph
        start = a.joined_pos + a.clip_l
        lo = int(np.searchsorted(g.snv_joined, start))
        hi = int(np.searchsorted(g.snv_joined, start + a.aln_span))
        if lo == hi:
            return None, ()
        offs, names = [], []
        for t in range(lo, hi):
            off = int(g.snv_joined[t]) - start
            if 0 <= off < len(rd_aligned) and \
                    rd_aligned[off] == g.snv_alt[t]:
                offs.append(off)
                names.append(self.variants.snp_names[int(g.snv_id[t])])
        if not offs:
            return None, ()
        parts, prev = [], -1
        for o, nm in zip(offs, names):
            parts.append(f"{o - prev - 1}|S|{nm}")
            prev = o
        return ",".join(parts), tuple(offs)

    # ------------------------------------------------------------------
    def align_batch(self, codes: np.ndarray, quals: np.ndarray,
                    lens: np.ndarray, rdids: np.ndarray = None
                    ) -> BatchResult:
        """Align one padded batch; returns per-read alignment lists.

        In spliced mode the batch re-runs until the splice-site DB reaches a
        fixed point: novel junctions reported by earlier reads become
        zero-penalty known sites for later reads (readid-gated on device),
        replicating the reference's sequential temp-splice-site semantics
        (useTempSpliceSite, hisat2.cpp:3180-3203,3559) batch-synchronously."""
        B = codes.shape[0]
        if rdids is None:
            rdids = np.arange(B, dtype=np.int64)
        if not self.spliced or self.splice_db is None:
            return self._run_batch(codes, quals, lens, rdids)
        res = None
        for _ in range(4):
            res = self._run_batch(codes, quals, lens, rdids)
            if not self.splice_db.collect_from_alignments(
                    res.alignments, rdids, lens, codes, self.ref_codes):
                break
        return res

    def _run_batch(self, codes: np.ndarray, quals: np.ndarray,
                   lens: np.ndarray, rdids: np.ndarray) -> BatchResult:
        B = codes.shape[0]
        C = self.max_cands
        minsc = np.array([self.scoring.min_score(int(l)) for l in lens],
                         np.int64)
        out = self._device_step(
            self.dev, self.params,
            jnp.asarray(codes, jnp.int32), jnp.asarray(quals, jnp.int32),
            jnp.asarray(lens, jnp.int32), jnp.asarray(minsc, jnp.int32),
            jnp.asarray(rdids, jnp.int32) if self.spliced else None,
            self.splice_db.device_tables() if self.spliced else None)
        o_np = {k2: np.asarray(v) for k2, v in out.items()}
        T = o_np["p_score"].shape[1] if "p_score" in o_np else 0
        K = C + T
        z2 = np.zeros((2 * B, T), np.int64)

        def flat(base, pair):
            return np.concatenate(
                [base.astype(np.int64),
                 pair.astype(np.int64) if T else z2[:, :0]],
                axis=1).reshape(-1)

        starts = flat(o_np["starts"], o_np.get("p_d1", z2))
        score = flat(o_np["score"], o_np.get("p_score", z2))
        n_mm = flat(o_np["n_mm"], z2)
        n_n_dev = flat(o_np["n_n"], z2)
        clip_l = flat(o_np["clip_l"], z2)
        clip_r = flat(o_np["clip_r"], z2)
        alt_score = flat(o_np["alt_score"],
                         np.full((2 * B, T), extend_ops.NO_ALT))
        junc_kind = flat(np.zeros((2 * B, C)), o_np.get("p_kind", z2))
        junc_x = flat(np.zeros((2 * B, C)), o_np.get("p_x", z2))
        d2 = flat(o_np["starts"], o_np.get("p_d2", z2))
        spl_dir = flat(np.zeros((2 * B, C)), o_np.get("p_spldir", z2))
        junc_known = flat(np.zeros((2 * B, C)), o_np.get("p_known", z2))
        BIGV = 2 ** 29
        if T:
            pv = o_np["p_score"] > -BIGV
            # suppress clipped ungapped candidates subsumed by a junction
            # candidate on the same diagonal: the reference only produces
            # trimmed GenomeHits as fallbacks, never alongside the combined
            # alignment they are a prefix/suffix of (hybridSearch trims only
            # when recursion fails; redundant() drops same-coord repeats)
            ug = o_np["valid"]
            ug_clip = (o_np["clip_l"] + o_np["clip_r"]) > 0
            m_d1 = o_np["starts"][:, :, None] == o_np["p_d1"][:, None, :]
            m_d2 = o_np["starts"][:, :, None] == o_np["p_d2"][:, None, :]
            beats = (o_np["p_score"][:, None, :]
                     >= o_np["score"][:, :, None]) & pv[:, None, :]
            sub = ((m_d1 | m_d2) & beats).any(axis=2)
            ug = ug & ~(ug_clip & sub)
            valid = np.concatenate([ug, pv], axis=1).reshape(-1)
        else:
            valid = o_np["valid"].reshape(-1)

        lane = np.repeat(np.arange(2 * B, dtype=np.int64), K)
        # host-side policy filters (all vectorized)
        maxn = np.array([self.scoring.max_n(int(l)) for l in lens], np.int64)
        read_of_lane = lane % B
        is_rc = lane >= B
        # pairs span the whole read: their N count is the read's N count
        n_read = np.array([(codes[i, :lens[i]] > 3).sum()
                           for i in range(B)], np.int64)
        n_n = np.where(junc_kind > 0, n_read[read_of_lane], n_n_dev)
        if self.no_fw:
            valid = valid & is_rc
        if self.no_rc:
            valid = valid & ~is_rc
        is_pair = junc_kind > 0
        valid = valid & (n_n <= maxn[read_of_lane]) \
            & (is_pair | (score >= minsc[read_of_lane]))
        # fragment containment (joinedToTextOff straddle check, gfm.h:5076);
        # junction candidates check each segment separately, and a splice may
        # cross an N-gap fragment boundary within the same reference
        L_of = lens[read_of_lane].astype(np.int64)
        ins_len = np.where(junc_kind == splice_ops.KIND_INS,
                           starts - d2, 0)
        aln_start = starts + clip_l
        left_end = np.where(is_pair, starts + junc_x,
                            aln_start + L_of - clip_l - clip_r)  # exclusive
        rs = np.where(junc_kind == splice_ops.KIND_INS,
                      starts + junc_x, d2 + junc_x)
        span_r = L_of - junc_x - ins_len
        nfr = len(self.frag_ref)
        fl = np.clip(np.searchsorted(self.frag_joined, aln_start,
                                     "right") - 1, 0, nfr - 1)
        contained_l = (aln_start >= self.frag_joined[fl]) & \
            (left_end <= self.frag_joined[fl + 1])
        fr = np.clip(np.searchsorted(self.frag_joined, rs, "right") - 1,
                     0, nfr - 1)
        contained_r = (rs >= self.frag_joined[fr]) & \
            (rs + span_r <= self.frag_joined[fr + 1])
        same_chr = self.frag_ref[fl] == self.frag_ref[fr]
        pair_ok = contained_l & contained_r & same_chr & \
            ((junc_kind == splice_ops.KIND_SPL) | (fl == fr))
        valid &= np.where(is_pair, pair_ok, contained_l)
        # reference-space skip length (an intron may span an N gap)
        rp_l_end = self.frag_off[fl] + (left_end - 1 - self.frag_joined[fl])
        rp_r = self.frag_off[fr] + (rs - self.frag_joined[fr])
        junc_len = np.where(
            junc_kind == splice_ops.KIND_SPL, rp_r - rp_l_end - 1,
            np.where(junc_kind == splice_ops.KIND_DEL, d2 - starts,
                     np.where(junc_kind == splice_ops.KIND_INS,
                              -(starts - d2), 0)))
        valid &= ~((junc_kind == splice_ops.KIND_SPL) & (junc_len < 1))

        per_read = [[] for _ in range(B)]
        sel = np.flatnonzero(valid)
        if not sel.size:
            return BatchResult(alignments=per_read, n_reads=B)
        # dedup identical (read, orient, start, junction), keeping the BEST
        # score per placement (a known splice site and the novel sweep can
        # produce the same junction; the known, unpenalized one must win)
        r = read_of_lane[sel]
        o = is_rc[sel].astype(np.int64)
        s = starts[sel].astype(np.int64)
        key = ((((((r * 2 + o) << 33) + s) << 2) + junc_kind[sel]) << 7) \
            + junc_x[sel]
        kd2 = junc_len[sel]
        perm = np.lexsort((-score[sel], kd2, key))
        kk, kk2 = key[perm], kd2[perm]
        firstmask = np.ones(len(perm), bool)
        firstmask[1:] = (kk[1:] != kk[:-1]) | (kk2[1:] != kk2[:-1])
        idx = sel[perm[firstmask]]
        r, o = read_of_lane[idx], is_rc[idx].astype(np.int64)
        s = starts[idx].astype(np.int64)
        sc = score[idx].astype(np.int64)
        # deterministic selection order: per read, score desc then position,
        # ungapped before junction candidates at equal (score, position)
        order = np.lexsort((junc_x[idx], junc_kind[idx], o, s, -sc, r))
        idx, r, o, s, sc = idx[order], r[order], o[order], s[order], sc[order]
        # per-read segments
        bnd = np.flatnonzero(np.diff(r, prepend=-1))
        seg_len = np.diff(np.append(bnd, len(r)))
        seg_of = np.repeat(np.arange(len(bnd)), seg_len)
        pos_in_seg = np.arange(len(r)) - bnd[seg_of]
        # per-segment summary -> MAPQ (vectorized BowtieMapq2).  The secbest
        # considers BOTH the second distinct placement and the best
        # alternate representation of the best placement (trimmed variants
        # the reference also counts into AlnSetSumm — hence ZS with NH:i:1)
        seg_read = r[bnd]
        best = sc[bnd]
        alt_of_best = alt_score[idx[bnd]].astype(np.int64)
        alt_valid = alt_of_best >= minsc[seg_read]
        sec_cand = np.where(seg_len > 1,
                            sc[np.minimum(bnd + 1, len(r) - 1)],
                            np.int64(-2 ** 40))
        # ZS counts trimmed representations of the best placement too;
        # MAPQ's secbest counts only DISTINCT placements (the reference
        # reports ZS yet MAPQ 60 when the only secbest is a trimmed variant)
        secbest = np.maximum(sec_cand, np.where(alt_valid, alt_of_best,
                                                np.int64(-2 ** 40)))
        has_sec = (seg_len > 1) | alt_valid
        perfect = np.zeros(len(bnd), np.int64) + np.array(
            [self.scoring.perfect_score(int(lens[x])) for x in seg_read])
        mq = mapq_mod.mapq_v2(best, np.maximum(sec_cand, -2 ** 30),
                              seg_len > 1, perfect, minsc[seg_read])
        seg_zs = np.where(has_sec, secbest, 0)
        n_rep = np.minimum(seg_len, self.k)
        keep = pos_in_seg < n_rep[seg_of]
        # fragment mapping for kept candidates
        ki = np.flatnonzero(keep)
        gi = idx[ki]
        astart = (s[ki] + clip_l[gi]).astype(np.int64)
        fi = np.searchsorted(self.frag_joined, astart, "right") - 1
        ref_id = self.frag_ref[fi]
        ref_pos = self.frag_off[fi] + (astart - self.frag_joined[fi])
        rd_len = lens[r[ki]]
        for t in range(len(ki)):
            i = ki[t]
            g = gi[t]
            rd = int(r[i])
            jk = int(junc_kind[g])
            jl = int(junc_len[g])
            span = int(rd_len[t]) - int(clip_l[g]) - int(clip_r[g]) + jl
            per_read[rd].append(Alignment(
                read_idx=rd, rc=bool(o[i]), ref_id=int(ref_id[t]),
                ref_pos=int(ref_pos[t]), joined_pos=int(s[i]),
                clip_l=int(clip_l[g]), clip_r=int(clip_r[g]),
                aln_span=span,
                score=int(sc[i]), n_mm=int(n_mm[g]), n_n=int(n_n[g]),
                mapq=int(mq[seg_of[i]]), nh=int(n_rep[seg_of[i]]),
                secondary=bool(pos_in_seg[i] > 0),
                zs=(int(seg_zs[seg_of[i]])
                    if has_sec[seg_of[i]] else None),
                junc_kind=jk, junc_x=int(junc_x[g]), junc_len=jl,
                junc_d2=int(d2[g]), spl_dir=int(spl_dir[g]),
                junc_known=bool(junc_known[g])))
        return BatchResult(alignments=per_read, n_reads=B)
