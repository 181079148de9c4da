"""UCSC dbSNP extractor parity: committed oracle outputs.

Fixtures in tests/data/ucsc: a synthetic 100 kb genome + 600-row UCSC
snpNNN table and the outputs of the reference
hisat2_extract_snps_haplotypes_UCSC.py (py3-shimmed) on them.
"""

import gzip
import io
import os

DATA = os.path.join(os.path.dirname(__file__), "data", "ucsc")


def test_ucsc_extractor_matches_reference(tmp_path):
    from hisat2_tpu.tools.variants_ucsc import extract_ucsc
    snp_txt = tmp_path / "snp.txt"
    snp_txt.write_bytes(gzip.open(f"{DATA}/snp.txt.gz", "rb").read())
    genome = io.StringIO(
        gzip.open(f"{DATA}/gen.fa.gz", "rt").read())
    base = str(tmp_path / "out")
    extract_ucsc(genome, str(snp_txt), base)
    for ext in ("snp", "haplotype"):
        got = open(f"{base}.{ext}").read()
        want = gzip.open(f"{DATA}/expected.{ext}.gz", "rt").read()
        assert got == want, f".{ext} differs from the reference output"
