"""Host-side FASTA/FASTQ reading into padded code batches.

Pattern-source equivalent of /root/reference/pat.h:936-1478 (FASTA) and
pat.h:1360 (FASTQ), reshaped for batch processing: instead of a mutex-guarded
per-read cursor feeding worker threads, the host parses whole files (or
chunks) into [B, L] code arrays + length vectors that stream to the device.
"""

from __future__ import annotations

import gzip
from typing import Iterator

import numpy as np

from ..utils import bitops


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def iter_fasta(path: str) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (name, codes uint8) per record."""
    name, parts = None, []
    with _open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(b">"):
                if name is not None:
                    yield name, bitops.encode_dna(b"".join(parts))
                name = line[1:].split()[0].decode()
                parts = []
            else:
                parts.append(line)
        if name is not None:
            yield name, bitops.encode_dna(b"".join(parts))


def iter_reads(path: str) -> Iterator[tuple[str, np.ndarray, np.ndarray]]:
    """Yield (name, codes, quals) for FASTA or FASTQ (by sniffing).

    FASTA reads get quality 40 everywhere ('I'), matching the reference's
    treatment of quality-less input (pat.h fasta parsers set quals to 'I')."""
    with _open(path) as f:
        first = f.read(1)
    if first == b"@":
        yield from _iter_fastq(path)
    else:
        for name, codes in iter_fasta(path):
            yield name, codes, np.full(len(codes), 40, np.uint8)


def _iter_fastq(path: str):
    with _open(path) as f:
        while True:
            h = f.readline()
            if not h:
                return
            h = h.strip()
            if not h:
                continue
            seq = f.readline().strip()
            f.readline()  # +
            qual = f.readline().strip()
            name = h[1:].split()[0].decode()
            codes = bitops.encode_dna(seq)
            quals = np.frombuffer(qual, dtype=np.uint8).astype(np.int16) - 33
            yield name, codes, np.clip(quals, 0, 63).astype(np.uint8)


class ReadBatch:
    """A padded batch: names, codes [B, L], quals [B, L], lens [B]."""

    def __init__(self, names, codes_list, quals_list, pad_to: int = None):
        self.names = names
        B = len(names)
        L = max((len(c) for c in codes_list), default=0)
        if pad_to is not None:
            L = pad_to
        self.codes = np.full((B, L), 4, np.uint8)
        self.quals = np.zeros((B, L), np.uint8)
        self.lens = np.zeros(B, np.int32)
        for i, (c, q) in enumerate(zip(codes_list, quals_list)):
            m = min(len(c), L)
            self.codes[i, :m] = c[:m]
            self.quals[i, :m] = q[:m]
            self.lens[i] = m

    def __len__(self):
        return len(self.names)


def read_batches(path: str, batch_size: int, pad_to: int = None,
                 skip: int = 0, limit: int = None):
    """Stream ReadBatches of at most batch_size reads (-u/-s equivalents)."""
    names, cs, qs = [], [], []
    seen = 0
    for name, codes, quals in iter_reads(path):
        if seen < skip:
            seen += 1
            continue
        if limit is not None and seen - skip >= limit:
            break
        seen += 1
        names.append(name)
        cs.append(codes)
        qs.append(quals)
        if len(names) == batch_size:
            yield ReadBatch(names, cs, qs, pad_to)
            names, cs, qs = [], [], []
    if names:
        yield ReadBatch(names, cs, qs, pad_to)
