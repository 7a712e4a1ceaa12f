"""Ecosystem scripts: pufferize / split_unitigs / abundance_stats /
unitig_evaluator, exercised on the reference's pufferize example
(/root/reference/example/pufferize/run.sh: k=9)."""

import subprocess
import sys
import os

import pytest

from bcalm_tpu import cli

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(ROOT, "scripts")

REFS = [
    "ACTAATCATTACATGAGATCAGGCAATG",
    "CAGGCAATGAGATGATAACATGATAGATGAGACCAATT",
    "AATTGGTCTGGTTGGATTGTACTCATGATG",
]


@pytest.fixture()
def built(tmp_path):
    refs = tmp_path / "refs.fa"
    with open(refs, "w") as f:
        for i, s in enumerate(REFS):
            f.write(f">{i + 1}\n{s}\n")
    rc = cli.main(["-in", str(refs), "-kmer-size", "9", "-abundance-min", "1",
                   "-out", str(tmp_path / "refs")])
    assert rc == 0
    return refs, tmp_path / "refs.unitigs.fa"


def run_script(name, *args):
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, name), *map(str, args)],
        capture_output=True, text=True, timeout=120,
    )


def test_unitig_evaluator_clean(built):
    refs, unitigs = built
    r = run_script("unitig_evaluator.py", unitigs, refs, 9)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "FP 0  FN 0" in r.stdout
    assert "REPEATED" not in r.stdout


def test_abundance_stats(built):
    _, unitigs = built
    r = run_script("abundance_stats.py", unitigs)
    assert r.returncode == 0
    assert r.stdout.strip()  # at least one histogram row


def test_pufferize_paths(built, tmp_path):
    refs, unitigs = built
    r = run_script("pufferize.py", refs, unitigs, 9)
    assert r.returncode == 0, r.stdout + r.stderr
    gfa = str(unitigs) + ".pufferized.gfa"
    segs = {}
    paths = []
    with open(gfa) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if parts[0] == "S":
                segs[parts[1]] = parts[2]
            elif parts[0] == "P":
                paths.append(parts[1])
    assert len(paths) == len(REFS)
    # respell every path and compare against its reference
    from bcalm_tpu.utils import dna

    k = 9
    for path_str, ref in zip(paths, REFS):
        spelled = ""
        for step in path_str.split(","):
            seg, ori = step[:-1], step[-1]
            s = segs[seg] if ori == "+" else dna.revcomp(segs[seg])
            spelled = s if not spelled else spelled + s[k - 1:]
        assert spelled == ref
        # every reference start-kmer starts a segment, end-kmer ends one
        first = path_str.split(",")[0]
        seg, ori = first[:-1], first[-1]
        s = segs[seg] if ori == "+" else dna.revcomp(segs[seg])
        assert s.startswith(ref[:k])


def test_split_unitigs(built):
    refs, unitigs = built
    r = run_script("split_unitigs.py", refs, unitigs, 9)
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l and not l.startswith(">")]
    # k-mer content preserved through splitting
    from bcalm_tpu.oracle import brute

    before = brute.unitig_kmer_decomposition(
        [l for l in open(unitigs).read().splitlines()
         if l and not l.startswith(">")], 9)
    after = brute.unitig_kmer_decomposition(lines, 9)
    assert set(after) == set(before)


def test_convert_to_gfa_script(built):
    _, unitigs = built
    out = str(unitigs) + ".gfa"
    r = run_script("convert_to_gfa.py", unitigs, out, 9)
    assert r.returncode == 0
    with open(out) as f:
        first = f.readline()
    assert first == "H\tVN:Z:1.0\tks:i:9\n"
