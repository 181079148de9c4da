"""Splice-site database: known (.ss / --known-splicesite-infile) + novel
sites discovered during the run (SpliceSiteDB equivalent,
/root/reference/splice_site.{h,cpp}).

The reference keeps per-chromosome red-black trees behind mutexes and lets
every worker thread query/update them per read (splice_site.h:519-615).
Here the DB is a host-side dict merged BATCH-SYNCHRONOUSLY: alignment passes
see a frozen site table (uploaded as sorted device arrays for the injection
kernel, ops/splice.py inject_known); newly reported junctions are folded in
between passes.  Single-thread reference semantics (-p 1: mindist=0,
hisat2.cpp:3559) are preserved exactly by re-running the batch with
discovery-readid gating until no new site appears: a site discovered by
read R is visible only to reads with rdid > R.

Novel-site admission mirrors SpliceSiteDB::addSpliceSite
(splice_site.cpp:190-300): only untrimmed alignments contribute, and each
junction's flanking anchors must be >= minAnchorLen + 2*mm (+6 if the
junction direction is unknown).
"""

from __future__ import annotations

import numpy as np

from ..ops.splice import SPL_UNKNOWN

_SENTINEL = np.int32(2 ** 30)


class SpliceSiteDB:
    def __init__(self, index, min_anchor: int = 15):
        self.meta = index.meta
        self.frag_joined = np.asarray(index.frag_joined)
        self.frag_ref = np.asarray(index.frag_ref)
        self.frag_off = np.asarray(index.frag_off)
        self.min_anchor = min_anchor
        # site dict: (ref, left, right) -> [dir, rdid(min), fromfile, nreads]
        self.sites = {}
        self._tables = {}           # cached device tables per shard
                                    # window (multi-shard dispatches
                                    # alternate windows; a single-slot
                                    # cache re-sorted and re-uploaded
                                    # the tables on every dispatch)
        self._by_ref = None         # cached host lookup (ref coords)
        self._capacity = 0

    # ------------------------------------------------------------------
    def _to_joined(self, ref_id: int, pos: int) -> int:
        sel = np.flatnonzero(self.frag_ref == ref_id)
        if not sel.size:
            return -1
        starts = self.frag_off[sel]
        f = int(np.searchsorted(starts, pos, "right")) - 1
        if f < 0:
            return -1
        fi = sel[f]
        span = self.frag_joined[fi + 1] - self.frag_joined[fi]
        off = pos - starts[f]
        if off >= span:
            return -1
        return int(self.frag_joined[fi] + off)

    # ------------------------------------------------------------------
    def add_known(self, ref_id: int, left: int, right: int, strand: int):
        """A from-file site (always visible).  left = last base of the left
        exon, right = first base of the right exon (0-based, ref coords —
        the .ss convention, hisat2_extract_splice_sites.py:85)."""
        key = (int(ref_id), int(left), int(right))
        if key not in self.sites:
            self.sites[key] = [SPL_UNKNOWN, -1, True, 0]
            self._tables = {}
            self._by_ref = None
        else:
            self.sites[key][2] = True
            self.sites[key][1] = -1

    def add_from_variants(self, vdb) -> None:
        for i in range(len(vdb.ss_ref)):
            self.add_known(vdb.ss_ref[i], vdb.ss_left[i], vdb.ss_right[i],
                           int(vdb.ss_strand[i]))

    def add_from_file(self, path: str) -> None:
        names = {nm: i for i, nm in enumerate(self.meta.ref_names)}
        with open(path) as f:
            for line in f:
                p = line.split()
                if len(p) < 3 or p[0] not in names:
                    continue
                self.add_known(names[p[0]], int(p[1]), int(p[2]),
                               1 if (len(p) < 4 or p[3] == "+") else -1)

    # ------------------------------------------------------------------
    def add_novel(self, ref_id: int, left: int, right: int, spl_dir: int,
                  rdid: int) -> bool:
        """Record a junction from a reported alignment; returns True if the
        site is new (triggers a re-pass)."""
        key = (int(ref_id), int(left), int(right))
        cur = self.sites.get(key)
        if cur is None:
            self.sites[key] = [int(spl_dir), int(rdid), False, 1]
            self._tables = {}
            self._by_ref = None
            return True
        cur[3] += 1
        if not cur[2] and rdid < cur[1]:
            cur[1] = int(rdid)
            self._tables = {}
            self._by_ref = None
        return False

    def joined_boundaries(self, since: int = 0) -> np.ndarray:
        """Sorted joined positions of site exon boundaries (the last
        left-exonic and first right-exonic base) — used by the two-pass
        pipeline to find perfect reads that could still carry an
        equal-score known-junction representation.  `since` restricts to
        sites added at insertion index >= since (sites only accumulate),
        so a pass whose injection table already contained the first
        `since` sites re-routes only against genuinely new ones."""
        if since >= len(self.sites):
            return np.zeros(0, np.int64)
        if since == 0 and getattr(self, "_bnd_key", None) == \
                len(self.sites):
            return self._bnd
        out = []
        keys = list(self.sites) if since == 0 else \
            list(self.sites)[since:]
        for (rid, left, right) in keys:
            jl = self._to_joined(rid, left)
            jr = self._to_joined(rid, right)
            if jl >= 0:
                out.append(jl)
            if jr >= 0:
                out.append(jr)
        bnd = np.unique(np.array(out, np.int64)) if out \
            else np.zeros(0, np.int64)
        if since == 0:
            self._bnd = bnd
            self._bnd_key = len(self.sites)
        return bnd

    def _to_ref(self, joined: int):
        f = int(np.searchsorted(self.frag_joined, joined, "right")) - 1
        f = min(max(f, 0), len(self.frag_ref) - 1)
        return (int(self.frag_ref[f]),
                int(self.frag_off[f] + joined - self.frag_joined[f]))

    def collect_from_alignments(self, per_read, rdids, lens, codes,
                                ref_codes) -> bool:
        """Scan reported alignments for novel junctions (addSpliceSite
        admission rules, splice_site.cpp:190: untrimmed alignments only,
        per-junction anchors (the read span to the neighbouring junction)
        >= minAnchorLen + 2*mm, +6 for direction-less junctions).
        Returns True if any new site was added."""
        added = False
        for alns in per_read:
            for a in alns:
                if a.junc_kind == 0 or a.clip_l or a.clip_r:
                    continue
                rd = int(rdids[a.read_idx])
                L = int(lens[a.read_idx])
                seq = codes[a.read_idx, :L]
                if a.rc:
                    seq = np.where(seq < 4, 3 - seq, 4)[::-1]
                segs, juncs = a.segments(L)
                mm = [int((seq[lo:hi] != ref_codes[diag + lo:diag + hi]
                           ).sum()) for lo, hi, diag in segs]
                dirs = [j[3] for j in juncs]
                for ji, (x, kind, jlen, jdir) in enumerate(juncs):
                    if kind != 1:
                        continue
                    seg_l, seg_r = segs[ji], segs[ji + 1]
                    extra = 6 if jdir == SPL_UNKNOWN else 0
                    if (seg_l[1] - seg_l[0]) < \
                            self.min_anchor + 2 * mm[ji] + extra:
                        continue
                    if (seg_r[1] - seg_r[0]) < \
                            self.min_anchor + 2 * mm[ji + 1] + extra:
                        continue
                    ref_id, left = self._to_ref(seg_l[2] + x - 1)
                    right = left + jlen + 1
                    if self.add_novel(ref_id, left, right, jdir, rd):
                        added = True
                del dirs
        return added

    # ------------------------------------------------------------------
    def max_intron_in(self, ref_id: int, up: int, dn: int, rdid: int):
        """Largest usable intron strictly inside (up, dn), JOINED coords —
        the template-length adjustment lookup (setFragmentLength,
        aligner_result.h:1624-1639).  A site is usable if from file or
        discovered by a read with id <= rdid."""
        if self._by_ref is None:
            import bisect
            by = {}
            for (ref, left, right), (sdir, srd, ff, nr) in \
                    self.sites.items():
                jl = self._to_joined(ref, left)
                jr = self._to_joined(ref, right)
                if jl < 0 or jr < 0:
                    continue
                by.setdefault(ref, []).append((jl, jr, srd, ff))
            for ref in by:
                by[ref].sort()
            self._by_ref = by
        import bisect
        lst = self._by_ref.get(int(ref_id))
        if not lst:
            return 0
        lo = bisect.bisect_right(lst, (up, 2 ** 62))
        best = 0
        for i in range(lo, len(lst)):
            jl, jr, srd, ff = lst[i]
            if jl >= dn:
                break
            if jr >= dn:
                continue
            if not ff and srd > rdid:
                continue
            best = max(best, jr - jl - 1)
        return best

    # ------------------------------------------------------------------
    @property
    def n_sites(self):
        return len(self.sites)

    def device_tables(self, base: int = 0, n: int = None):
        """Sorted site arrays (joined coords) padded to a power-of-two
        capacity so jit signatures stay stable as sites accumulate.

        base/n select a SHARD window: global joined coords in
        [base, base+n) rebase to shard-local, sites outside drop (the
        shard's device pass only sees its own slice of the genome)."""
        import jax.numpy as jnp
        cached = self._tables.get((base, n))
        if cached is not None:
            return cached
        kd, ka, rdid = [], [], []
        for (ref, left, right), (sdir, srd, ff, nr) in self.sites.items():
            jl = self._to_joined(ref, left)
            jr = self._to_joined(ref, right)
            if jl < 0 or jr < 0:
                continue
            if base or n is not None:
                jl -= base
                jr -= base
                hi = n if n is not None else (1 << 62)
                if jl < 0 or jr < 0 or jl >= hi or jr >= hi:
                    continue
            kd.append(jl)
            ka.append(jr)
            rdid.append(srd)
        n = len(kd)
        cap = 64
        while cap < n + 1:
            cap *= 2
        if cap < self._capacity:
            cap = self._capacity
        self._capacity = cap
        akd = np.full(cap, _SENTINEL, np.int32)
        aka = np.full(cap, _SENTINEL, np.int32)
        ard = np.full(cap, -1, np.int32)
        if n:
            kd = np.asarray(kd, np.int32)
            ka = np.asarray(ka, np.int32)
            rdid = np.asarray(rdid, np.int32)
            o = np.lexsort((ka, kd))
            akd[:n], aka[:n], ard[:n] = kd[o], ka[o], rdid[o]
            o2 = np.lexsort((kd, ka))
            akd2 = np.full(cap, _SENTINEL, np.int32)
            aka2 = np.full(cap, _SENTINEL, np.int32)
            ard2 = np.full(cap, -1, np.int32)
            aka2[:n], akd2[:n], ard2[:n] = ka[o2], kd[o2], rdid[o2]
        else:
            akd2, aka2, ard2 = akd.copy(), aka.copy(), ard.copy()
        tabs = {
            "ss_kd": jnp.asarray(akd), "ss_ka": jnp.asarray(aka),
            "ss_rdid": jnp.asarray(ard),
            "ss_ka_s": jnp.asarray(aka2), "ss_kd_s": jnp.asarray(akd2),
            "ss_rdid_a": jnp.asarray(ard2),
        }
        self._tables[(base, n)] = tabs
        return tabs

    # ------------------------------------------------------------------
    def write_novel(self, path: str) -> None:
        """--novel-splicesite-outfile (hisat2.cpp:3955-3963): novel sites in
        .ss format with strand from the junction direction."""
        rows = []
        for (ref, left, right), (sdir, srd, ff, nr) in self.sites.items():
            if ff:
                continue
            strand = "+" if sdir in (1, 3) else ("-" if sdir in (2, 4)
                                                 else ".")
            rows.append((self.meta.ref_names[ref], left, right, strand))
        rows.sort()
        with open(path, "w") as f:
            for nm, left, right, strand in rows:
                f.write(f"{nm}\t{left}\t{right}\t{strand}\n")
