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

from ..ops.splice import (SPL_UNKNOWN, SS_MERGE_HEADROOM, SS_NBINS,
                          SS_SB)

# padding sentinel for the sorted device arrays: must exceed every real
# shard-local position (shards reach ~2 Gbp, so 2^30 — the old value —
# would break the arrays' monotonicity and with it every searchsorted
# site lookup above 1.07 Gbp)
_SENTINEL = np.int32(2 ** 31 - 2)

# incremental-update upload granularity: new-site rows are padded to
# this fixed length so the merge jit compiles once per capacity
_MERGE_CHUNK = 512
_merge_jits = {}


def _merge_sorted_tabs(kd, ka, rd, ka_s, kd_s, rd_a, nkd, nka, nrd,
                       lob_kd=None, lob_ka=None, bins_kd=None,
                       bins_ka=None, wts=None):
    """Fold newly-appended (still unsorted) site rows into both sorted
    device table sets ON DEVICE: concat + stable argsort on the packed
    (major, minor) key, slice back to capacity (the dropped tail rows
    are sentinel padding by construction).  Equivalent to a host
    lexsort rebuild + full re-upload, at ~KBs of tunnel traffic.

    When bucket indexes are attached (ops/splice.table_searchsorted),
    they update in the same jit: per-bin counts of the new rows
    (bins_kd/bins_ka int32 [_MERGE_CHUNK], wts 1 for real rows) feed an
    exclusive cumsum added onto lob — lob[b] stays the count of rows
    with key < b << shift."""
    global _merge_jits
    key = lob_kd is not None
    if key not in _merge_jits:
        import jax
        import jax.numpy as jnp

        def merge3(a_major, a_minor, a_rd, n_major, n_minor, n_rd):
            # lexsort via two stable passes (minor then major) — int64
            # packed keys silently truncate to int32 without x64 mode
            cap = a_major.shape[0]
            mj = jnp.concatenate([a_major, n_major])
            mn = jnp.concatenate([a_minor, n_minor])
            r2 = jnp.concatenate([a_rd, n_rd])
            o1 = jnp.argsort(mn, stable=True)
            o2 = jnp.argsort(mj[o1], stable=True)
            o = o1[o2]
            return mj[o][:cap], mn[o][:cap], r2[o][:cap]

        def lob_add(lob, bins, w):
            cnt = jnp.zeros(SS_NBINS, jnp.int32).at[bins].add(w)
            return lob + jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt)])

        if key:
            def body(kd, ka, rd, ka_s, kd_s, rd_a, nkd, nka, nrd,
                     lob_kd, lob_ka, bins_kd, bins_ka, wts):
                kd1, ka1, rd1 = merge3(kd, ka, rd, nkd, nka, nrd)
                ka2, kd2, rd2 = merge3(ka_s, kd_s, rd_a, nka, nkd, nrd)
                return (kd1, ka1, rd1, ka2, kd2, rd2,
                        lob_add(lob_kd, bins_kd, wts),
                        lob_add(lob_ka, bins_ka, wts))
        else:
            def body(kd, ka, rd, ka_s, kd_s, rd_a, nkd, nka, nrd):
                kd1, ka1, rd1 = merge3(kd, ka, rd, nkd, nka, nrd)
                ka2, kd2, rd2 = merge3(ka_s, kd_s, rd_a, nka, nkd, nrd)
                return kd1, ka1, rd1, ka2, kd2, rd2
        _merge_jits[key] = jax.jit(body)
    args = (kd, ka, rd, ka_s, kd_s, rd_a, nkd, nka, nrd)
    if key:
        args += (lob_kd, lob_ka, bins_kd, bins_ka, wts)
    return _merge_jits[key](*args)


class SpliceSiteDB:
    def __init__(self, index, min_anchor: int = 15):
        self.meta = index.meta
        self.frag_joined = np.asarray(index.frag_joined)
        self.frag_ref = np.asarray(index.frag_ref)
        self.frag_off = np.asarray(index.frag_off)
        self.min_anchor = min_anchor
        # site dict: (ref, left, right) -> [dir, rdid(min), fromfile, nreads]
        self.sites = {}
        # columnar mirror in insertion order (device_tables and
        # joined_boundaries are vectorized over these instead of looping
        # the dict — a 200k-site Python loop cost 2.6 s per rebuild and
        # ran up to 4x per batch at genome scale)
        self._col_jl = []           # joined donor (last left-exonic)
        self._col_jr = []           # joined acceptor (first right-exonic)
        self._col_rdid = []
        self._rdid_dirty = False    # an existing row's rdid was lowered
        self._tables = {}           # per-(base, n): dict with keys
                                    #   tabs / rows / nreal
        self._by_ref = None         # cached host lookup (ref coords)
        self._capacity = 0
        self._frag_by_ref = None

    # ------------------------------------------------------------------
    def _to_joined(self, ref_id: int, pos: int) -> int:
        if self._frag_by_ref is None:
            by = {}
            for fi, r in enumerate(np.asarray(self.frag_ref)):
                by.setdefault(int(r), []).append(fi)
            self._frag_by_ref = {
                r: (self.frag_off[np.array(fis)],
                    self.frag_joined[np.array(fis)],
                    (self.frag_joined[np.array(fis) + 1]
                     - self.frag_joined[np.array(fis)]))
                for r, fis in by.items()}
        ent = self._frag_by_ref.get(int(ref_id))
        if ent is None:
            return -1
        starts, joined, spans = ent
        f = int(np.searchsorted(starts, pos, "right")) - 1
        if f < 0:
            return -1
        off = pos - int(starts[f])
        if off >= int(spans[f]):
            return -1
        return int(joined[f]) + off

    # ------------------------------------------------------------------
    def _col_append(self, ref_id: int, left: int, right: int, rdid: int):
        self._col_jl.append(self._to_joined(ref_id, left))
        self._col_jr.append(self._to_joined(ref_id, right))
        self._col_rdid.append(int(rdid))

    def add_known(self, ref_id: int, left: int, right: int, strand: int):
        """A from-file site (always visible).  left = last base of the left
        exon, right = first base of the right exon (0-based, ref coords —
        the .ss convention, hisat2_extract_splice_sites.py:85)."""
        key = (int(ref_id), int(left), int(right))
        if key not in self.sites:
            self.sites[key] = [SPL_UNKNOWN, -1, True, 0, len(self.sites)]
            self._col_append(ref_id, left, right, -1)
            self._by_ref = None
        else:
            ent = self.sites[key]
            if not ent[2] or ent[1] != -1:
                ent[2] = True
                ent[1] = -1
                self._col_rdid[ent[4]] = -1
                self._rdid_dirty = True
                self._by_ref = None

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
            self.sites[key] = [int(spl_dir), int(rdid), False, 1,
                               len(self.sites)]
            self._col_append(ref_id, left, right, rdid)
            self._by_ref = None
            return True
        cur[3] += 1
        if not cur[2] and rdid < cur[1]:
            cur[1] = int(rdid)
            self._col_rdid[cur[4]] = int(rdid)
            self._rdid_dirty = True
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
        jl = np.asarray(self._col_jl[since:], np.int64)
        jr = np.asarray(self._col_jr[since:], np.int64)
        bnd = np.unique(np.concatenate([jl[jl >= 0], jr[jr >= 0]]))
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
            jl = np.asarray(self._col_jl, np.int64)
            jr = np.asarray(self._col_jr, np.int64)
            rd = np.asarray(self._col_rdid, np.int64)
            ok = (jl >= 0) & (jr >= 0)
            jl, jr, rd = jl[ok], jr[ok], rd[ok]
            f = np.searchsorted(self.frag_joined, jl, "right") - 1
            ref = self.frag_ref[np.clip(f, 0, len(self.frag_ref) - 1)]
            o = np.lexsort((jr, jl))
            by = {}
            for r in np.unique(ref):
                sel = o[ref[o] == r]
                by[int(r)] = (jl[sel], jr[sel], rd[sel])
            self._by_ref = by
        ent = self._by_ref.get(int(ref_id))
        if ent is None:
            return 0
        sjl, sjr, srd = ent
        lo = int(np.searchsorted(sjl, up, "right"))
        hi = int(np.searchsorted(sjl, dn, "left"))
        if lo >= hi:
            return 0
        jr_w = sjr[lo:hi]
        # usable: from file (rdid -1) or discovered by a read <= rdid
        use = (jr_w < dn) & (srd[lo:hi] <= rdid)
        if not use.any():
            return 0
        return int((jr_w[use] - sjl[lo:hi][use] - 1).max())

    # ------------------------------------------------------------------
    @property
    def n_sites(self):
        return len(self.sites)

    def _window_cols(self, base, n, lo_row=0):
        """Shard-window filter over the columnar store rows >= lo_row:
        (kd, ka, rdid) int32 arrays in shard-local coords."""
        jl = np.asarray(self._col_jl[lo_row:], np.int64)
        jr = np.asarray(self._col_jr[lo_row:], np.int64)
        rd = np.asarray(self._col_rdid[lo_row:], np.int32)
        keep = (jl >= 0) & (jr >= 0)
        if base or n is not None:
            jl = jl - base
            jr = jr - base
            hi = n if n is not None else (1 << 62)
            keep &= (jl >= 0) & (jr >= 0) & (jl < hi) & (jr < hi)
        return (jl[keep].astype(np.int32), jr[keep].astype(np.int32),
                rd[keep])

    def device_tables(self, base: int = 0, n: int = None):
        """Sorted site arrays (joined coords) padded to a power-of-two
        capacity so jit signatures stay stable as sites accumulate.

        base/n select a SHARD window: global joined coords in
        [base, base+n) rebase to shard-local, sites outside drop (the
        shard's device pass only sees its own slice of the genome).

        Incremental: when only NEW sites were appended since the cached
        build (the steady-state batch loop), the fresh rows are uploaded
        alone (~KBs) and merged into the sorted device arrays ON DEVICE
        — no 2.6 s host rebuild, no multi-MB re-upload over the tunnel
        per invalidation (measured: table churn was 10.4 s of an 11.6 s
        genome-scale batch)."""
        import jax.numpy as jnp
        rows = len(self._col_jl)
        cached = self._tables.get((base, n))
        if cached is not None and cached["rows"] == rows \
                and not self._rdid_dirty:
            return cached["tabs"]
        cap0 = self._capacity
        cap = max(cap0, 64)
        while cap < rows + 1:
            cap *= 2
        if cached is not None and not self._rdid_dirty and cap == cap0 \
                and 0 < rows - cached["rows"] <= _MERGE_CHUNK:
            kd, ka, rd = self._window_cols(base, n,
                                           lo_row=cached["rows"])
            m = len(kd)
            t = cached["tabs"]
            have_lob = "ss_kd_lob" in t
            # bucket spans were bounded at rebuild assuming at most
            # SS_MERGE_HEADROOM incremental rows; past that, rebuild
            incr_ok = (not have_lob) or \
                (cached.get("incr", 0) + m <= SS_MERGE_HEADROOM)
            if m and cached["nreal"] + m <= cap - 1 and incr_ok:
                pkd = np.full(_MERGE_CHUNK, _SENTINEL, np.int32)
                pka = np.full(_MERGE_CHUNK, _SENTINEL, np.int32)
                prd = np.full(_MERGE_CHUNK, -1, np.int32)
                pkd[:m], pka[:m], prd[:m] = kd, ka, rd
                lob_args = ()
                if have_lob:
                    sh = int(cached["shift"])
                    bkd = np.zeros(_MERGE_CHUNK, np.int32)
                    bka = np.zeros(_MERGE_CHUNK, np.int32)
                    wts = np.zeros(_MERGE_CHUNK, np.int32)
                    bkd[:m] = np.clip(kd.astype(np.int64) >> sh,
                                      0, SS_NBINS - 1)
                    bka[:m] = np.clip(ka.astype(np.int64) >> sh,
                                      0, SS_NBINS - 1)
                    wts[:m] = 1
                    lob_args = (t["ss_kd_lob"], t["ss_ka_lob"],
                                jnp.asarray(bkd), jnp.asarray(bka),
                                jnp.asarray(wts))
                merged = _merge_sorted_tabs(
                    t["ss_kd"], t["ss_ka"], t["ss_rdid"],
                    t["ss_ka_s"], t["ss_kd_s"], t["ss_rdid_a"],
                    jnp.asarray(pkd), jnp.asarray(pka),
                    jnp.asarray(prd), *lob_args)
                tabs = dict(zip(("ss_kd", "ss_ka", "ss_rdid",
                                 "ss_ka_s", "ss_kd_s", "ss_rdid_a"),
                                merged[:6]))
                ent = {"tabs": tabs, "rows": rows,
                       "nreal": cached["nreal"] + m,
                       "incr": cached.get("incr", 0) + m}
                if have_lob:
                    tabs["ss_kd_lob"], tabs["ss_ka_lob"] = merged[6:8]
                    tabs["ss_shift"] = t["ss_shift"]
                    ent["shift"] = cached["shift"]
                self._tables[(base, n)] = ent
                return tabs
            if not m:
                cached["rows"] = rows
                return cached["tabs"]
        # full (vectorized) rebuild
        self._capacity = cap
        kd, ka, rdid = self._window_cols(base, n)
        nn = len(kd)
        akd = np.full(cap, _SENTINEL, np.int32)
        aka = np.full(cap, _SENTINEL, np.int32)
        ard = np.full(cap, -1, np.int32)
        akd2 = np.full(cap, _SENTINEL, np.int32)
        aka2 = np.full(cap, _SENTINEL, np.int32)
        ard2 = np.full(cap, -1, np.int32)
        if nn:
            o = np.lexsort((ka, kd))
            akd[:nn], aka[:nn], ard[:nn] = kd[o], ka[o], rdid[o]
            o2 = np.lexsort((kd, ka))
            aka2[:nn], akd2[:nn], ard2[:nn] = ka[o2], kd[o2], rdid[o2]
        tabs = {
            "ss_kd": jnp.asarray(akd), "ss_ka": jnp.asarray(aka),
            "ss_rdid": jnp.asarray(ard),
            "ss_ka_s": jnp.asarray(aka2), "ss_kd_s": jnp.asarray(akd2),
            "ss_rdid_a": jnp.asarray(ard2),
        }
        ent = {"tabs": tabs, "rows": rows, "nreal": nn, "incr": 0}
        # bucket index (ops/splice.table_searchsorted): lob[b] = first
        # row with key >= b << shift.  Attached only when every bin span
        # plus the incremental-merge headroom fits SS_SB binary steps.
        n_eff = 1
        if nn:
            n_eff = int(max(akd[nn - 1], aka2[nn - 1])) + 1
        shift = max(0, (n_eff - 1).bit_length() - SS_NBINS.bit_length()
                    + 1)
        edges = np.arange(SS_NBINS + 1, dtype=np.int64) << shift
        lob_kd = np.searchsorted(akd[:nn], edges).astype(np.int32)
        lob_ka = np.searchsorted(aka2[:nn], edges).astype(np.int32)
        span = 0
        if nn:
            span = int(max(np.diff(lob_kd).max(), np.diff(lob_ka).max()))
        if span + SS_MERGE_HEADROOM < (1 << SS_SB):
            tabs["ss_kd_lob"] = jnp.asarray(lob_kd)
            tabs["ss_ka_lob"] = jnp.asarray(lob_ka)
            tabs["ss_shift"] = jnp.asarray(np.int32(shift))
            ent["shift"] = shift
        # rdid fixups are folded in by this rebuild; other windows'
        # caches rebuild on their next request
        stale = [k for k, v in self._tables.items()
                 if k != (base, n) and (self._rdid_dirty
                                        or v["rows"] != rows)]
        if self._rdid_dirty:
            for k in stale:
                del self._tables[k]
            self._rdid_dirty = False
        self._tables[(base, n)] = ent
        return tabs

    # ------------------------------------------------------------------
    def write_novel(self, path: str) -> None:
        """--novel-splicesite-outfile (hisat2.cpp:3955-3963): novel sites in
        .ss format with strand from the junction direction."""
        rows = []
        for (ref, left, right), (sdir, srd, ff, nr, *_) in self.sites.items():
            if ff:
                continue
            strand = "+" if sdir in (1, 3) else ("-" if sdir in (2, 4)
                                                 else ".")
            rows.append((self.meta.ref_names[ref], left, right, strand))
        rows.sort()
        with open(path, "w") as f:
            for nm, left, right, strand in rows:
                f.write(f"{nm}\t{left}\t{right}\t{strand}\n")
