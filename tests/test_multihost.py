"""Multi-host execution: 2-process CLI run must byte-match single-host.

Each process owns batches i with i % 2 == rank, writes a SAM shard, and
rank 0 performs the deterministic ordered merge (parallel/multihost.py;
reference analog: outq.h OutputQueue + SURVEY §2.6 read-shard design).
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen([sys.executable, "-m", "hisat2_tpu"] + args,
                            cwd=cwd, env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)


def test_two_process_merge(tmp_path):
    rng = np.random.default_rng(31)
    g = rng.integers(0, 4, 40000)
    ACGT = np.array(list("ACGT"))
    (tmp_path / "g.fa").write_text(
        ">c\n" + "".join(ACGT[g]) + "\n")
    with open(tmp_path / "r.fa", "w") as f:
        for i in range(300):
            s = int(rng.integers(0, 40000 - 80))
            f.write(f">r{i}\n" + "".join(ACGT[g[s:s + 80]]) + "\n")
    d = str(tmp_path)
    assert _cli(["build", "g.fa", "idx"], d).wait(600) == 0
    base = ["align", "-x", "idx", "-f", "-U", "r.fa",
            "--no-spliced-alignment", "--batch-size", "64"]
    assert _cli(base + ["-S", "single.sam"], d).wait(900) == 0
    p1 = _cli(base + ["--n-hosts", "2", "--host-rank", "1",
                      "-S", "multi.sam"], d)
    p0 = _cli(base + ["--n-hosts", "2", "--host-rank", "0",
                      "-S", "multi.sam"], d)
    assert p0.wait(900) == 0 and p1.wait(900) == 0
    single = (tmp_path / "single.sam").read_text()
    multi = (tmp_path / "multi.sam").read_text()
    body = lambda t: [l for l in t.splitlines()  # noqa: E731
                      if not l.startswith("@")]
    assert body(single) == body(multi)
