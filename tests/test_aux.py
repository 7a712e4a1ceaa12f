"""Aux subsystems: spans, dispatcher, binary bank, chunk configuration."""

import random

import numpy as np
import pytest

from bcalm_tpu import engine
from bcalm_tpu.io import bank_binary, packing
from bcalm_tpu.models import spans
from bcalm_tpu.utils import dispatcher


def test_span_dispatch():
    assert spans.span_of(13) == 1
    assert spans.span_of(31) == 2
    assert spans.span_of(33) == 3
    assert spans.span_of(63) == 4
    with pytest.raises(ValueError):
        spans.validate_k(1)
    with pytest.raises(ValueError):
        spans.validate_k(spans.MAX_K + 1)
    table = spans.span_table(100)
    # spans cover 2..100 contiguously
    assert table[0][1] == 2
    assert table[-1][2] == 100
    for (L, lo, hi), (L2, lo2, _) in zip(table, table[1:]):
        assert lo2 == hi + 1 and L2 == L + 1


def test_prefetch_preserves_order_and_errors():
    assert list(dispatcher.prefetch(iter(range(100)), depth=3)) == list(range(100))

    def boom():
        yield 1
        raise RuntimeError("ingest failure")

    with pytest.raises(RuntimeError, match="ingest failure"):
        list(dispatcher.prefetch(boom()))


def test_parallel_files_complete():
    files = {f"f{i}": list(range(i * 10, i * 10 + 5)) for i in range(5)}
    got = list(dispatcher.parallel_files(
        list(files), lambda p: iter(files[p]), n_workers=3))
    assert sorted(got) == sorted(v for vs in files.values() for v in vs)


def test_binary_bank_roundtrip(tmp_path):
    rng = random.Random(0)
    seqs = ["".join(rng.choice("ACGT") for _ in range(40)) for _ in range(20)]
    blocks = list(packing.iter_blocks(seqs, 13, block_reads=8, max_len=64))
    path = str(tmp_path / "reads.btpu.npz")
    n = bank_binary.write_bank(blocks, path)
    assert n == len(blocks)
    back = list(bank_binary.read_bank(path))
    assert len(back) == len(blocks)
    for a, b in zip(blocks, back):
        assert (a.words == b.words).all() and (a.lengths == b.lengths).all()
    assert bank_binary.is_binary_bank(path)


def test_configure_chunk():
    cfg = engine.EngineConfig(k=31)
    default = cfg.chunk_kmers
    engine.configure_chunk(cfg, 0)
    assert cfg.chunk_kmers == default  # 0 = auto, unchanged
    engine.configure_chunk(cfg, 100)   # 100 MB
    assert cfg.chunk_kmers < default
    assert cfg.chunk_kmers >= 1 << 20
    cfg2 = engine.EngineConfig(k=63)
    engine.configure_chunk(cfg2, 100)
    assert cfg2.chunk_kmers <= cfg.chunk_kmers  # more lanes -> smaller chunks
