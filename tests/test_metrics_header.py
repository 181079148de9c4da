"""The --met interval log's column header must match the reference's
PerfMetrics::reportInterval header verbatim (hisat2.cpp:2090-2243), so
downstream tooling that parses reference metrics files can consume ours
unchanged (VERDICT round-2 item 8)."""

import os
import re

REF = "/root/reference/hisat2.cpp"


def test_met_columns_match_reference_header():
    from hisat2_tpu.align.metrics import _COLUMNS
    if not os.path.exists(REF):
        import pytest
        pytest.skip("reference source not available")
    src = open(REF).read()
    i = src.index('/*  1 */ "Time"')
    j = src.index('"\\n";', i)
    cols = re.findall(r'"([A-Za-z0-9]+)"\s+"\\t"', src[i:j])
    assert list(cols) == list(_COLUMNS)


def test_met_file_emits_header_and_rows(tmp_path):
    import io

    import numpy as np

    from hisat2_tpu.align.metrics import MetricsSink, _COLUMNS

    class W:   # minimal writer-stats stand-in
        n_reads = 10
        n_unal = 1
        n_uniq = 8
        n_multi = 1
        n_pairs = 0
        n_conc_uniq = 0
        n_conc_multi = 0
        n_disc = 0
        n_mate_unal = 0
        n_mate_uniq = 0
        n_mate_multi = 0

    p = tmp_path / "met.tsv"
    m = MetricsSink(str(p), interval=0.0)
    m.maybe_report(W(), 1000, force=True)
    m.close(W(), 1000)
    lines = p.read_text().splitlines()
    assert lines[0].rstrip("\t").split("\t") == _COLUMNS
    assert len(lines) >= 2
    row = lines[1].rstrip("\t").split("\t")
    assert len(row) == len(_COLUMNS)
