"""Unitig FASTA writer with reference-compatible headers.

Header grammar (cited /root/reference/README.md:62-80):

    ><id> LN:i:<length> KC:i:<total> km:f:<mean> L:<+/->:<other>:<+/-> [..]

and with -all-abundance-counts:

    ><id> LN:i:<length> ab:Z:<a_0> .. <a_(len-k)> L:...

IDs are dense integers from 0 (consumed as such by
/root/reference/scripts/convertToGFA.py:93).
"""

from __future__ import annotations

from typing import IO, List

from bcalm_tpu.engine import UnitigSet


def format_header(us: UnitigSet, i: int, all_abundance_counts: bool = False) -> str:
    fields = [f"LN:i:{len(us.seqs[i])}"]
    if all_abundance_counts:
        ab = " ".join(str(int(a)) for a in us.abundances[i])
        fields.append(f"ab:Z:{ab}")
    else:
        n_kmers = max(1, len(us.abundances[i]))
        fields.append(f"KC:i:{int(us.kc[i])}")
        fields.append(f"km:f:{us.kc[i] / n_kmers:.1f}")
    for (u, su, v, sv) in us.links:
        if u == i:
            fields.append(f"L:{su}:{v}:{sv}")
    return f">{i} " + " ".join(fields)


def write_fasta(us: UnitigSet, out: IO[str], all_abundance_counts: bool = False,
                line_width: int = 0) -> None:
    for i, seq in enumerate(us.seqs):
        out.write(format_header(us, i, all_abundance_counts) + "\n")
        if line_width and line_width > 0:
            for j in range(0, len(seq), line_width):
                out.write(seq[j : j + line_width] + "\n")
        else:
            out.write(seq + "\n")


def parse_unitigs_fasta(path: str):
    """Parse a bcalm-format unitigs FASTA back into (seqs, headers) — used
    by resume (-redo-links) and by tests."""
    seqs: List[str] = []
    headers: List[str] = []
    cur: List[str] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
                headers.append(line[1:])
            elif line:
                cur.append(line)
        if cur:
            seqs.append("".join(cur))
    return seqs, headers
