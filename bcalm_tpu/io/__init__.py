"""Sequence I/O: banks (FASTA/FASTQ readers), packing, writers."""
