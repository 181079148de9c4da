"""Hybrid evaluation-model emulator vs a committed oracle corpus.

``emu_*`` (tests/data): a 300 kbp genome with a 2.5 kbp unit duplicated
at three loci (two forward, one reverse-complement) and 144 reads
covering the search-path-sensitive shapes the batched sweeps cannot
decide byte-exactly: head/tail indels behind 3-20 bp flanks (gap-vs-clip
choices), interior 1-5 bp indels, multimapped gap/mismatch sets from the
duplicated unit, and plain mismatch reads.  Oracle: hisat2-align-s
v2.1.0 ``--no-spliced-alignment -f -U`` (generator recorded in
PARITY.md).

Every read must match the oracle on (flag-strand, pos, CIGAR, AS, MD,
NH, ZS, NM) — full-record equality over the selected report set.
"""

import collections
import gzip
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
CODE = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}


@pytest.fixture(scope="module")
def emu_index(tmp_path_factory):
    from hisat2_tpu.index.builder import build_fm_index
    d = tmp_path_factory.mktemp("emu")
    seqs = []
    name, chunks = None, []
    with gzip.open(f"{DATA}/emu_genome.fa.gz", "rt") as f:
        for line in f:
            if line.startswith(">"):
                name = line[1:].split()[0]
            else:
                chunks.append(line.strip())
    codes = np.array([CODE[c] for c in "".join(chunks)], np.int8)
    return build_fm_index([(name, codes)])


def _load_reads():
    reads, name = [], None
    for line in open(f"{DATA}/emu_reads.fa"):
        if line.startswith(">"):
            name = line[1:].strip()
        else:
            reads.append((name, np.array([CODE[c] for c in line.strip()],
                                         np.int8)))
    return reads


def _load_oracle():
    oracle = collections.defaultdict(list)
    with gzip.open(f"{DATA}/emu_ref.sam.gz", "rt") as f:
        for line in f:
            if line[0] == "@":
                continue
            fs = line.rstrip("\n").split("\t")
            if fs[5] == "*":
                continue
            tags = {t.split(":")[0]: t for t in fs[11:]}
            oracle[fs[0]].append(
                (int(fs[1]) & 16, int(fs[3]), fs[5], tags.get("AS", ""),
                 tags.get("MD", ""), tags.get("NH", ""),
                 tags.get("ZS", ""), tags.get("NM", "")))
    return oracle


def test_hybrid_emulator_oracle_parity(emu_index):
    from hisat2_tpu.align import rng as rng_mod
    from hisat2_tpu.align.hybrid import (HybridAligner, finalize,
                                         render_fields)

    emu = HybridAligner(emu_index, k=5)
    oracle = _load_oracle()
    bad = []
    for name, codes in _load_reads():
        L = len(codes)
        quals = np.full(L, ord("I"), np.int64)
        sink, minsc = emu.align_read(codes, quals, L)
        seed = rng_mod.gen_rand_seed(codes, quals, name, 0)
        hits, nh, zs = finalize(sink, seed, emu.khits)
        mine = []
        for h in hits:
            pos1, cigar, mdz, a_s, xm, xo, xg, nm = render_fields(h)
            mine.append((0 if h.fw else 16, pos1, cigar, f"AS:i:{a_s}",
                         f"MD:Z:{mdz}", f"NH:i:{nh}",
                         f"ZS:i:{zs}" if zs is not None else "",
                         f"NM:i:{nm}"))
        if sorted(mine) != sorted(oracle[name]):
            bad.append((name, sorted(mine), sorted(oracle[name])))
    assert not bad, f"{len(bad)} reads diverge; first: {bad[0]}"
