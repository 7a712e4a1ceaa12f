#!/usr/bin/env python
"""FASTA -> GFA1 converter CLI (capability port of the reference's
scripts/convertToGFA.py; the conversion logic lives in bcalm_tpu.io.gfa).

usage: convert_to_gfa.py input.unitigs.fa output.gfa k [--single-directed]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bcalm_tpu.io.gfa import fasta_to_gfa  # noqa: E402


def main():
    p = argparse.ArgumentParser(
        description="Convert a bcalm-format unitigs FASTA to GFA1.")
    p.add_argument("inputFilename")
    p.add_argument("outputFilename")
    p.add_argument("kmerSize", type=int)
    p.add_argument("-s", "--single-directed", action="store_true",
                   dest="single_directed",
                   help="emit only one edge per mirror pair")
    args = p.parse_args()
    with open(args.outputFilename, "w") as out:
        fasta_to_gfa(args.inputFilename, out, args.kmerSize,
                     single_directed=args.single_directed)
    print("done")


if __name__ == "__main__":
    main()
