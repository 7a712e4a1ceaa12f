#!/usr/bin/env python
"""Pufferize: split unitigs at reference extremity k-mers and emit a
pufferfish-ready GFA with reference paths (capability port of the
reference's scripts/pufferize.py — same documented contract: every k-mer
beginning a reference begins a unitig, every k-mer ending a reference ends
one; segments are renumbered; P-lines give each reference as a walk over
oriented segments; afterwards links can be recomputed with
`bcalm-tpu -in [prefix] -skip-bcalm -skip-bglue -redo-links`).

usage: pufferize.py references.fa unitigs.fa k
output: unitigs.fa.pufferized.gfa
"""

import sys

from split_unitigs import iter_fasta, revcomp, split_unitig  # noqa: E402


def normalize(kmer):
    rc = revcomp(kmer)
    return kmer if kmer < rc else rc


def main():
    if len(sys.argv) != 4:
        sys.exit("usage: pufferize.py references.fa unitigs.fa k")
    refs_path, unitigs_path, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    starts, ends = set(), set()
    for _, ref in iter_fasta(refs_path):
        if len(ref) >= k:
            starts.add(ref[:k])
            ends.add(ref[-k:])

    out_path = unitigs_path + ".pufferized.gfa"
    out = open(out_path, "w")

    # segment emission + oriented start-k-mer index for path reconstruction:
    # a path step starting with string w is either a segment whose forward
    # spelling starts with w (+) or one whose forward spelling ends with
    # revcomp(w) (-)
    start_index = {}  # exact k-mer string -> (segment id, length, orientation)
    uid = 0
    for _, seq in iter_fasta(unitigs_path):
        for piece in split_unitig(seq, k, starts, ends):
            if len(piece) == k:
                piece = normalize(piece)
            out.write(f"S\t{uid}\t{piece}\n")
            for key, ori in ((piece[:k], "+"), (revcomp(piece[-k:]), "-")):
                if key in start_index:
                    print(f"warning: repeated extremity k-mer near segment "
                          f"{uid}", file=sys.stderr)
                start_index[key] = (uid, len(piece), ori)
            uid += 1

    # reference paths: walk each reference via unitig extremities
    for _, ref in iter_fasta(refs_path):
        if len(ref) < k:
            continue
        steps = []
        i = 0
        while i < len(ref) - k + 1:
            kmer = ref[i : i + k]
            hit = start_index.get(kmer)
            if hit is None:
                sys.exit(f"ERROR: k-mer not found at a unitig extremity: {kmer}")
            seg, length, ori = hit
            steps.append(f"{seg}{ori}")
            i += length - k + 1
        out.write("P\t" + ",".join(steps) + "\n")
    out.close()
    print(f"done. result is in: {out_path}")
    print("to recompute links on the split unitigs:")
    print(f"  bcalm-tpu -in [prefix] -skip-bcalm -skip-bglue -redo-links "
          f"-kmer-size {k}")


if __name__ == "__main__":
    main()
