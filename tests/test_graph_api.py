"""UnitigGraph navigation API tests."""

import numpy as np

from bcalm_tpu import engine
from bcalm_tpu.graph.unitigs import Node, UnitigGraph
from bcalm_tpu.oracle import brute
from bcalm_tpu.utils import dna


def test_navigation_consistency():
    """Edges reported by the graph must satisfy the k-1 overlap rule."""
    seqs = ["ACTAATCATTACATGAGATCAGGCAATG",
            "CAGGCAATGAGATGATAACATGATAGATGAGACCAATT",
            "AATTGGTCTGGTTGGATTGTACTCATGATG"]
    k = 9
    us = engine.build_from_seqs(seqs, engine.EngineConfig(k=k, abundance_min=1))
    g = UnitigGraph.from_unitig_set(us)
    assert len(g) == len(us.seqs)
    n_edges = 0
    for node in g.nodes():
        for orient in (node, node.reverse()):
            for succ in g.successors(orient):
                assert g.sequence(orient)[-(k - 1):] == \
                    g.sequence(succ)[: k - 1]
                n_edges += 1
                # mirror symmetry
                assert orient.reverse() in g.successors(succ.reverse())
    assert n_edges == len(us.links)


def test_walk_spelling_recovers_genome():
    """A single linear genome: walking the graph respells it."""
    genome = "ACTGCTGACTGAGTCATGTGTGGGT"
    k = 13
    us = engine.build_from_seqs([genome], engine.EngineConfig(k=k, abundance_min=1))
    g = UnitigGraph.from_unitig_set(us)
    node = Node(0, "+")
    spelled = g.spell_walk([node])
    assert spelled in (genome, dna.revcomp(genome))


def test_load_from_fasta(tmp_path):
    from bcalm_tpu.io import fasta_writer

    seqs = ["ACTTAGCGGACTTAGC"]
    k = 7
    us = engine.build_from_seqs(seqs, engine.EngineConfig(k=k, abundance_min=1))
    path = tmp_path / "u.fa"
    with open(path, "w") as f:
        fasta_writer.write_fasta(us, f)
    g = UnitigGraph.load(str(path), k)
    assert len(g) == len(us.seqs)
    # circular unitig: successor of itself on both strands
    node = Node(0, "+")
    assert node in g.successors(node)
    assert g.out_degree(node) >= 1
    assert g.in_degree(node) >= 1


def test_simple_path_and_degrees():
    # seq1 -> seq2 with a tip branch at abundance 1 (minitip at amin=1)
    seqs = (["ACTGATGCAGATGACACTGATGCAGATGAC"] * 3
            + ["ATGACACTGATGCAGATGACAGTAGTGGGG"] * 3
            + ["ATGACACTGATGCAGATGACT"])
    us = engine.build_from_seqs(seqs, engine.EngineConfig(k=21, abundance_min=1))
    g = UnitigGraph.from_unitig_set(us)
    assert len(g) > 1
    branching = [n for n in g.nodes() if g.is_branching(n) or
                 g.is_branching(n.reverse())]
    assert branching  # the tip creates a branch point
