"""Benchmark: BASELINE.json metrics on the production pipeline.

Configs (synthetic read sets at the scales BASELINE.json names; no
network, so real E. coli / C. elegans downloads are replaced by
random genomes of the corresponding size/coverage):

  headline   1 Mbp x24, k=31    — counting + compaction device metrics
  ecoli50x   4.6 Mbp x50, k=31  — E. coli-class scale, counting + compact
  spill31    12 Mbp x15, k=31   — genuinely out-of-core (distinct set >
             device residency budget -> multi-pass key-range counting)
  bigk51     20 Mbp x8, k=51    — multi-lane large-k config through the
             same multi-pass out-of-core path
  e2e        CLI run on a gzipped FASTA on disk (native ingest ->
             unitigs.fa with links), wall-clock + peak RSS
  celegans   (opt-in BENCH_SCALE=1) 100 Mbp x40, k=31 (3.2G occ) and
             bigk51_3g 50 Mbp x60, k=51 (2G occ) — C. elegans-class
             scale through the CLI with the sampled content oracle
             (BASELINE.md configs; the 100M-solid k=51 combination
             exceeds this chip's compaction memory, docs/OOC.md)

Prints ONE JSON line.  The primary metric stays canonical k-mers
counted/sec/chip; glued/sec, per-config numbers, and compile (warmup)
times are carried as extra keys.  vs_baseline: ratio against 1e7
canonical k-mers/s/node, a documented assumption for reference-class DSK
counting throughput on a commodity CPU node (the repository publishes no
numbers — BASELINE.md; the BCALM2 paper reports "hours for a human
genome" on one desktop, consistent with ~1e7/s).

Out-of-core configs are bounded below by the HOST LINK, not by compute:
the tunneled TPU moves ~30 MB/s each way (scripts/probe_transfer.py), so
a 20M-distinct k=51 table (480 MB) cannot leave the device in under
~16s here; on a real TPU host (PCIe, ~10 GB/s) the identical code is
compute-bound.  docs/OOC.md has the measured breakdown.

Env knobs: BENCH_PLATFORM (cpu to force CPU), BENCH_SKIP (comma list of
config names to skip), BENCH_BUDGET_S (wall budget, default 600; checked
before every config and before e2e input generation), BENCH_SCALE=1
(adds the C. elegans-class CLI config), BENCH_K/BENCH_GENOME/
BENCH_COVERAGE/BENCH_READ_LEN/BENCH_CHUNK override the headline config.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_KMERS_PER_SEC = 1.0e7


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def gen_reads(genome_len: int, read_len: int, coverage: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    genome = rng.randint(0, 4, size=genome_len).astype(np.uint8)
    n_reads = genome_len * coverage // read_len
    starts = rng.randint(0, genome_len - read_len, size=n_reads)
    return genome[starts[:, None] + np.arange(read_len)[None, :]]


def pack_uniform(reads: np.ndarray) -> np.ndarray:
    """(R, len) uint8 codes -> (R, W) uint32 big-endian packed."""
    R, n = reads.shape
    W = (n + 15) // 16
    padded = np.zeros((R, W * 16), dtype=np.uint32)
    padded[:, :n] = reads
    shifts = (2 * (15 - np.arange(16))).astype(np.uint32)
    return (padded.reshape(R, W, 16) << shifts[None, None, :]).sum(
        axis=2, dtype=np.uint32
    )


def make_blocks(words, read_len, block_reads):
    from bcalm_tpu.io.packing import ReadBlock

    R = words.shape[0]
    blocks = []
    for i in range(0, R, block_reads):
        chunk = words[i : i + block_reads]
        if chunk.shape[0] < block_reads:  # pad final block (empty reads)
            pad = np.zeros((block_reads - chunk.shape[0], words.shape[1]),
                           np.uint32)
            chunk = np.concatenate([chunk, pad])
        lengths = np.full((block_reads,), read_len, np.int32)
        lengths[min(R - i, block_reads):] = 0
        blocks.append(ReadBlock(chunk, lengths))
    return blocks


def device_config(name, k, genome_len, coverage, read_len, chunk,
                  runs=3, seed=0, resident=None):
    """Count + compact a synthetic read set on-device; returns metrics.

    resident: k-mer slots resident on device before multi-pass key-range
    counting engages (exercises the beyond-HBM out-of-core path at real
    scale when set below the distinct count)."""
    import jax.numpy as jnp

    from bcalm_tpu import engine
    from bcalm_tpu.ops import count as count_op

    cfg = engine.EngineConfig(k=k, abundance_min=2, block_reads=8192,
                              max_len=read_len, chunk_kmers=chunk)
    if resident:
        cfg.resident_kmers = resident
    reads = gen_reads(genome_len, read_len, coverage, seed)
    words = pack_uniform(reads)
    blocks = make_blocks(words, read_len, cfg.block_reads)
    n_occ = int(reads.shape[0] * (read_len - k + 1))
    cfg.est_total_occ = n_occ
    log(f"[{name}] {reads.shape[0]} reads, {len(blocks)} blocks, "
        f"{n_occ} k-mer occ, k={k}")

    def count_device(blocks_iter):
        unique, counts, minpos, n_unique, stats = engine.count_blocks(
            blocks_iter, cfg, reread=lambda: iter(blocks))
        if isinstance(unique, np.ndarray):
            # multi-pass path: host-resident exact table; filter in numpy
            # (the table just crossed the link — masking is free)
            keep = ((counts >= cfg.abundance_min)
                    & (counts <= cfg.abundance_max))
            return (unique[:, keep], counts[keep], minpos[keep],
                    int(keep.sum()), int(n_unique), stats)
        # elementwise fold filter + ONE stacked scalar fetch (the
        # production build_from_blocks path)
        solidF, countsF, posF, nn_dev = count_op.filter_abundance_fold(
            unique, counts, minpos, n_unique,
            cfg.abundance_min, cfg.abundance_max)
        nn = np.asarray(nn_dev)
        n_u, n_solid = int(nn[0]), int(nn[1])
        cap = engine._round_capacity(max(1, n_u))
        return (solidF[:, :cap], countsF[:cap], posF[:cap],
                n_solid, n_u, stats)

    # warmup = one FULL run: compiles/loads every shape class the timed
    # runs touch (full chunk, LSM merge ladder, final merge, fetch
    # programs) — a 1-block warmup left those to load INSIDE the timed
    # region, which recorded 3x-degraded OOC numbers in round 4
    t0 = time.time()
    count_device(iter(blocks))
    count_warm = time.time() - t0
    log(f"[{name}] count warmup (compile) {count_warm:.1f}s")

    times = []
    result = None
    for _ in range(runs):
        t0 = time.time()
        result = count_device(iter(blocks))
        times.append(time.time() - t0)
    t_count = min(times)
    solid_f, counts_f, pos_f, n_solid, n_distinct, stats = result
    kmers_per_sec = n_occ / t_count
    log(f"[{name}] count {t_count*1e3:.1f}ms for {n_occ} occ "
        f"({n_distinct} distinct, {n_solid} solid, "
        f"{stats.get('ooc_passes', 1)} passes) = "
        f"{kmers_per_sec/1e6:.1f}M/s")
    if "timing" in stats:
        log(f"[{name}] count timing {stats['timing']}")

    if isinstance(solid_f, np.ndarray):
        cap = engine._round_capacity(max(1, n_solid))
        L = solid_f.shape[0]
        solid_d = jnp.asarray(np.concatenate(
            [solid_f, np.zeros((L, cap - n_solid), np.uint32)], axis=1))
        counts_d = jnp.asarray(np.concatenate(
            [counts_f, np.zeros((cap - n_solid,), np.int32)]))
        pos_d = jnp.asarray(np.concatenate(
            [pos_f, np.full((cap - n_solid,), count_op.SENTINEL,
                            np.uint32)]))
    else:
        # device path: folded arrays already sliced to cap(n_distinct);
        # compact_solid_pos' reorder compacts the fold
        solid_d, counts_d, pos_d = solid_f, counts_f, pos_f
    t0 = time.time()
    _, _, _, info = engine.compact_solid_pos(
        solid_d, counts_d, pos_d, n_solid, k)
    nu = int(info["n_unitigs"])
    compact_warm = time.time() - t0
    log(f"[{name}] compact warmup {compact_warm:.1f}s -> {nu} unitigs")
    times = []
    for _ in range(runs):
        t0 = time.time()
        _, _, _, info = engine.compact_solid_pos(
            solid_d, counts_d, pos_d, n_solid, k)
        nu = int(info["n_unitigs"])
        times.append(time.time() - t0)
    t_compact = min(times)
    glued_per_sec = n_solid / max(t_compact, 1e-9)
    log(f"[{name}] compact {t_compact*1e3:.1f}ms = "
        f"{glued_per_sec/1e6:.2f}M glued/s ({nu} unitigs)")
    return {
        "k": k,
        "kmer_occ": n_occ,
        "n_solid": n_solid,
        "ooc_passes": stats.get("ooc_passes", 1),
        "count_ms": round(t_count * 1e3, 1),
        "kmers_per_sec": round(kmers_per_sec, 1),
        "compact_ms": round(t_compact * 1e3, 1),
        "glued_per_sec": round(glued_per_sec, 1),
        "count_warmup_s": round(count_warm, 1),
        "compact_warmup_s": round(compact_warm, 1),
        "n_unitigs": nu,
    }


def make_genome(genome_len, rng, repeat_frac=0.0):
    """Random genome, optionally seeded with duplicated segments so the
    de Bruijn graph has real junctions (repeat_frac of the length is
    covered by copies of earlier segments, 500-5000 bp each — the
    round-4 scale runs compacted uniform-random genomes to ONE unitig,
    exercising no glue machinery at scale)."""
    genome = rng.randint(0, 4, size=genome_len).astype(np.uint8)
    target = int(genome_len * repeat_frac)
    placed = 0
    while placed < target:
        seg_len = int(rng.randint(500, 5001))
        src = int(rng.randint(0, genome_len - seg_len))
        dst = int(rng.randint(0, genome_len - seg_len))
        genome[dst:dst + seg_len] = genome[src:src + seg_len]
        placed += seg_len
    return genome


def sample_reads(genome, n_reads, read_len, rng, err_rate=0.0,
                 dup_frac=0.0):
    """(n_reads, read_len) uint8 codes; substitution errors at err_rate
    (error k-mers inflate the distinct set ~k-fold per error — the
    realistic counting load real Illumina data presents).

    dup_frac: fraction of reads emitted twice (PCR duplicates).  Errors
    in duplicated reads reach count 2 and SURVIVE -abundance-min 2 —
    the realistic mechanism that gives deep short-read assemblies their
    millions of error-bubble/tip unitigs."""
    n_orig = int(n_reads / (1.0 + dup_frac)) if dup_frac else n_reads
    starts = rng.randint(0, genome.shape[0] - read_len, size=n_orig)
    reads = genome[starts[:, None] + np.arange(read_len)[None, :]].copy()
    if err_rate > 0:
        n_err = rng.binomial(n_orig * read_len, err_rate)
        pos_r = rng.randint(0, n_orig, size=n_err)
        pos_c = rng.randint(0, read_len, size=n_err)
        shift = rng.randint(1, 4, size=n_err).astype(np.uint8)
        reads[pos_r, pos_c] = (reads[pos_r, pos_c] + shift) % 4
    if dup_frac:
        n_dup = n_reads - n_orig
        dup_idx = rng.randint(0, n_orig, size=n_dup)
        reads = np.concatenate([reads, reads[dup_idx]], axis=0)
        perm = rng.permutation(reads.shape[0])
        reads = reads[perm]
    return reads


def _cached_reads_gz(genome_len, coverage, read_len, seed,
                     repeat_frac=0.0, err_rate=0.0, dup_frac=0.0):
    """Generate (once) and cache the e2e input FASTA: input generation
    cost 47s of driver budget per run in round 3."""
    import gzip

    cache_dir = os.environ.get("BENCH_CACHE_DIR", "/tmp/btpu_bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    tag = ""
    if repeat_frac or err_rate or dup_frac:
        tag = f"_r{repeat_frac:g}_e{err_rate:g}"
        if dup_frac:
            tag += f"_d{dup_frac:g}"
    path = os.path.join(
        cache_dir,
        f"reads_g{genome_len}_c{coverage}_l{read_len}_s{seed}{tag}.fa.gz")
    if os.path.exists(path) and os.path.getsize(path) > 0:
        log(f"[e2e] cached input {path} ({os.path.getsize(path)>>20} MB)")
        return path
    rng = np.random.RandomState(seed)
    genome = make_genome(genome_len, rng, repeat_frac)
    lut = np.frombuffer(b"ACTG", np.uint8)
    n_reads = genome_len * coverage // read_len
    t0 = time.time()
    tmp = path + ".tmp"
    with gzip.open(tmp, "wb", compresslevel=1) as f:
        # chunked generation: 30M-read scale inputs exceed RAM if
        # materialized as one (n_reads, read_len) array + joined bytes
        chunk_r = 1_000_000
        for base in range(0, n_reads, chunk_r):
            m = min(chunk_r, n_reads - base)
            codes = lut[sample_reads(genome, m, read_len, rng, err_rate,
                                     dup_frac=dup_frac)]
            lines = b"\n".join(
                b">r%d\n%s" % (base + i, codes[i].tobytes())
                for i in range(m)
            ) + b"\n"
            f.write(lines)
    os.replace(tmp, path)
    log(f"[e2e] wrote {n_reads} reads ({os.path.getsize(path)>>20} MB gz) "
        f"in {time.time()-t0:.1f}s")
    return path


def cli_config(name, genome_len, coverage, read_len, k, seed,
               extra_args=(), check=False, repeat_frac=0.0, err_rate=0.0,
               dup_frac=0.0):
    """Full CLI run: gzipped FASTA on disk -> unitigs.fa (native ingest,
    counting, compaction, links, write).  Wall-clock + peak RSS +
    stage-derived glued/s.

    check=True: run the sampled k-mer-content oracle
    (scripts/sampled_check.py) on the output before cleanup and carry
    its verdict in the metrics (the scale configs' correctness
    evidence).  repeat_frac/err_rate make the input realistic (junction-
    rich repeats, error-inflated distinct sets)."""
    import shutil
    import tempfile

    reads_path = _cached_reads_gz(genome_len, coverage, read_len, seed,
                                  repeat_frac=repeat_frac,
                                  err_rate=err_rate, dup_frac=dup_frac)
    n_reads = genome_len * coverage // read_len
    d = tempfile.mkdtemp(prefix="btpu_bench_")
    local = os.path.join(d, "reads.fa.gz")
    os.symlink(reads_path, local)

    env = dict(os.environ)
    # PREPEND the repo (keep e.g. the axon sitecustomize path that
    # registers the TPU plugin — replacing PYTHONPATH outright left the
    # subprocess with JAX_PLATFORMS=axon but no axon backend)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.abspath(__file__))]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "bcalm_tpu", "-in", local,
         "-kmer-size", str(k), "-abundance-min", "2", "-verbose", "1",
         *extra_args],
        cwd=d, env=env, capture_output=True, text=True, timeout=3600,
    )
    wall = time.time() - t0
    if proc.returncode != 0:
        log(f"[{name}] CLI FAILED rc={proc.returncode}\n"
            f"{proc.stderr[-2000:]}")
        shutil.rmtree(d, ignore_errors=True)
        return {"error": proc.returncode}
    peak_mb = None
    n_unitigs = None
    vals = {}
    for line in proc.stdout.splitlines():
        if "peak_rss_mb" in line:
            peak_mb = int(line.split()[-1])
        if line.startswith("wrote "):
            n_unitigs = int(line.split()[1])
        if "[time:" in line:
            log(f"[{name}] {line.strip()}")
        for key in ("t_count_s", "t_compact_s", "t_assemble_s",
                    "solid_kmers", "distinct_kmers"):
            if f"[{key}]" in line:
                vals[key] = float(line.split()[-1])
    out_path = os.path.join(d, "reads.unitigs.fa")
    out_mb = os.path.getsize(out_path) >> 20 if os.path.exists(out_path) else 0
    occ = n_reads * (read_len - k + 1)
    log(f"[{name}] {wall:.1f}s wall, {occ} occ -> {n_unitigs} unitigs "
        f"({out_mb} MB), peak RSS {peak_mb} MB, stage {vals}")
    res = {
        "k": k,
        "kmer_occ": occ,
        "wall_s": round(wall, 1),
        "kmers_per_sec_e2e": round(occ / wall, 1),
        "peak_rss_mb": peak_mb,
        "n_unitigs": n_unitigs,
    }
    if vals.get("t_compact_s") and vals.get("solid_kmers"):
        res["n_solid"] = int(vals["solid_kmers"])
        res["glued_per_sec"] = round(
            vals["solid_kmers"] / vals["t_compact_s"], 1)
    if vals.get("t_count_s"):
        res["kmers_per_sec_count"] = round(occ / vals["t_count_s"], 1)
    if check and os.path.exists(out_path):
        chk = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "sampled_check.py"),
             out_path, reads_path, str(k), "5000", "2"],
            capture_output=True, text=True, timeout=3600)
        verdict = (chk.stdout.strip().splitlines() or ["(no output)"])[-1]
        log(f"[{name}] {verdict}")
        res["oracle"] = verdict if chk.returncode == 0 else \
            f"FAILED: {chk.stderr[-200:]}"
    shutil.rmtree(d, ignore_errors=True)
    return res


def server_config(name, genome_len, coverage, read_len, k, seed,
                  extra_args=()):
    """e2e through the -server keep-alive mode: the same CLI build runs
    twice in one long-lived process; run 2's wall is the steady-state
    cost (backend init + cached-program loads amortized away — the
    VERDICT-r4 'per-invocation fixed overhead' item)."""
    import json
    import shutil
    import socket as socket_mod
    import tempfile

    reads_path = _cached_reads_gz(genome_len, coverage, read_len, seed)
    n_reads = genome_len * coverage // read_len
    occ = n_reads * (read_len - k + 1)
    d = tempfile.mkdtemp(prefix="btpu_srv_")
    local = os.path.join(d, "reads.fa.gz")
    os.symlink(reads_path, local)
    sock = os.path.join(d, "srv.sock")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.abspath(__file__))]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    srv = subprocess.Popen(
        [sys.executable, "-m", "bcalm_tpu", "-server", sock],
        cwd=d, env=env, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    try:
        for _ in range(120):
            if os.path.exists(sock):
                break
            time.sleep(0.5)

        def run_once(tag):
            cli = socket_mod.socket(socket_mod.AF_UNIX,
                                    socket_mod.SOCK_STREAM)
            cli.settimeout(1800)
            cli.connect(sock)
            argv = ["-in", local, "-kmer-size", str(k),
                    "-abundance-min", "2", "-out", os.path.join(d, tag),
                    "-verbose", "1", *extra_args]
            t0 = time.time()
            cli.sendall(json.dumps({"argv": argv}).encode() + b"\n")
            data = b""
            while not data.endswith(b"\n"):
                chunk = cli.recv(1 << 16)
                if not chunk:
                    break
                data += chunk
            wall = time.time() - t0
            resp = json.loads(data)
            return wall, resp

        w1, r1 = run_once("w1")
        w2, r2 = run_once("w2")
        if r1.get("rc") or r2.get("rc"):
            return {"error": f"rc {r1.get('rc')}/{r2.get('rc')}"}
        n_unitigs = None
        for line in r2.get("output", "").splitlines():
            if line.startswith("wrote "):
                n_unitigs = int(line.split()[1])
        log(f"[{name}] warm wall {w2:.1f}s (first-through-server "
            f"{w1:.1f}s), {occ} occ = {occ/w2/1e6:.1f}M occ/s e2e warm")
        return {
            "k": k,
            "kmer_occ": occ,
            "wall_warm_s": round(w2, 1),
            "wall_first_s": round(w1, 1),
            "kmers_per_sec_e2e_warm": round(occ / w2, 1),
            "n_unitigs": n_unitigs,
        }
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=20)
        except subprocess.TimeoutExpired:
            srv.kill()
        shutil.rmtree(d, ignore_errors=True)


def main():
    import jax

    # the axon sitecustomize force-overrides JAX_PLATFORMS; BENCH_PLATFORM
    # re-forces a backend (e.g. cpu for local smoke tests)
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from bcalm_tpu.utils.jaxcache import enable_cache

    enable_cache()
    log(f"bench: devices={jax.devices()}")

    skip = set(os.environ.get("BENCH_SKIP", "").split(","))
    # wall budget: on a COLD compile cache the remote TPU compile service
    # takes minutes-to-tens-of-minutes per new program class; rather than
    # time out with no output, later configs are skipped once the budget
    # is spent (reported in the JSON), and a warm cache runs everything
    budget = float(os.environ.get("BENCH_BUDGET_S", 600))
    t_start = time.time()
    out = {}
    skipped = []

    k = int(os.environ.get("BENCH_K", 31))
    genome_len = int(os.environ.get("BENCH_GENOME", 1_000_000))
    read_len = int(os.environ.get("BENCH_READ_LEN", 150))
    coverage = int(os.environ.get("BENCH_COVERAGE", 24))
    chunk = int(os.environ.get("BENCH_CHUNK", 8 * 1024 * 1024))

    def budget_left(name):
        if name in skip:
            return False
        if time.time() - t_start > budget:
            skipped.append(name)
            log(f"[{name}] skipped: bench budget exhausted "
                f"({time.time()-t_start:.0f}s > {budget:.0f}s)")
            return False
        return True

    def run_config(name, fn):
        """Run one config; a failure degrades the report, never kills it."""
        if not budget_left(name):
            return
        try:
            out[name] = fn()
        except Exception as e:  # noqa: BLE001 — report and continue
            log(f"[{name}] FAILED: {e!r}")
            out[name] = {"error": str(e)[:200]}
        log(f"[partial] {json.dumps(out.get(name))}")

    run_config("headline", lambda: device_config(
        "headline", k, genome_len, coverage, read_len, chunk))
    # 2^24 chunks win at >=64M-occurrence scale (merge traffic dominates)
    run_config("ecoli50x", lambda: device_config(
        "ecoli50x", 31, 4_600_000, 50, 150, 16 * 1024 * 1024, runs=2,
        seed=2))
    # out-of-core configs: resident=1 clamps the device budget to the
    # 2-chunk floor, engaging the key-range OOC machinery (host-resident
    # table, exactly-once fetch).  spill31's 12M distinct exceeds the
    # floor even with the 1.2x split-trigger hysteresis -> a genuine
    # 2-pass run; bigk51 is the VERDICT-named shape (20M distinct,
    # 480 MB table) whose floor here is the ~30 MB/s host link — with
    # hysteresis its 19.9M distinct sits just under the split trigger,
    # so it demos the link-bound fetch path in a single pass
    # e2e runs BEFORE the out-of-core configs: on a slow tunnel day the
    # budget must sacrifice the OOC re-measurements, not the CLI wall
    # (round 3's only-missing headline number)
    run_config("e2e", lambda: cli_config(
        "e2e",
        int(os.environ.get("BENCH_E2E_GENOME", 4_600_000)),
        int(os.environ.get("BENCH_E2E_COVERAGE", 50)), 150, 31, seed=1))
    # steady-state e2e: same build through the -server keep-alive mode
    # (cold-process fixed overhead amortized; docs/COMPILE.md finding 7)
    run_config("e2e_warm", lambda: server_config(
        "e2e_warm",
        int(os.environ.get("BENCH_E2E_GENOME", 4_600_000)),
        int(os.environ.get("BENCH_E2E_COVERAGE", 50)), 150, 31, seed=1))
    # human-chr1-shaped span (BASELINE.md's last named config, k=63):
    # resident-path counting + hashed-junction-key compaction at L=4.
    # Runs BEFORE the out-of-core configs: on a slow tunnel day the
    # budget should sacrifice OOC re-measurements, not a named config.
    run_config("bigk63", lambda: device_config(
        "bigk63", 63, 20_000_000, 8, 150, chunk, runs=2, seed=5))
    run_config("spill31", lambda: device_config(
        "spill31", 31, 12_000_000, 15, 150, 4 * 1024 * 1024, runs=1,
        seed=4, resident=1))
    run_config("bigk51", lambda: device_config(
        "bigk51", 51, 20_000_000, 8, 150, chunk, runs=1, seed=3,
        resident=1))
    if os.environ.get("BENCH_SCALE"):
        # C. elegans-class scale (BASELINE.md configs), opt-in because
        # generation + runs exceed the default driver budget.  All three
        # use REALISTIC inputs (8% duplicated segments -> junction-rich
        # graphs with ~1M+ unitigs; 0.1-0.3% substitution errors ->
        # error-inflated distinct sets, the load real Illumina data
        # presents), unlike the round-4 runs whose uniform-random
        # genomes compacted to n_unitigs=1:
        #   celegans:   the named 100 Mbp genome, k=31, 30x, errors on
        #               (~100M genomic + error distinct)
        #   realistic2g: 30 Mbp x70 k=31 (2.1G occ) with repeats+errors
        #   bigk51_3g:  k=51 at 50 Mbp x60 — hashed junction keys lift
        #               the old 13 GB exact-key sort ceiling
        # error rates sized so distinct (genome + ~k new k-mers per
        # error) stays under ~120M: the backend hits an opaque allocator
        # ResourceExhausted past ~150-190M distinct (docs/OOC.md) —
        # e.g. err 0.001 on 3 Gbp at k=31 alone adds ~93M error k-mers
        # -max-memory 6000 (not 8000): the ~110M-distinct load OOMs the
        # allocator with 8000's 2^26-cap merge transients; 6000 sizes
        # 2^25-cap merges (1.6 GB transient) at the cost of ~2 extra
        # passes (docs/OOC.md round-5 notes)
        run_config("celegans", lambda: cli_config(
            "celegans", 100_000_000, 30, 150, 31, seed=7,
            extra_args=("-max-memory", "6000"), check=True,
            repeat_frac=0.05, err_rate=0.0001))
        run_config("realistic2g", lambda: cli_config(
            "realistic2g", 30_000_000, 70, 150, 31, seed=9,
            extra_args=("-max-memory", "8000"), check=True,
            repeat_frac=0.08, err_rate=0.0005))
        # million-unitig evidence: PCR duplicates let error k-mers reach
        # count 2 and survive -abundance-min — every surviving error
        # site spawns a bubble/tip, the mechanism behind real deep
        # short-read assemblies' unitig counts
        # err 0.0013: the 0.0008 run produced 660k unitigs (BENCH_SCALE
        # errorgraph2g_r5); surviving error sites scale linearly with
        # err, and ~430k sites put the graph past 1M unitigs while
        # total distinct (~85M) stays under the ~120M allocator wall
        run_config("errorgraph2g", lambda: cli_config(
            "errorgraph2g", 30_000_000, 70, 150, 31, seed=10,
            extra_args=("-max-memory", "6000"), check=True,
            repeat_frac=0.05, err_rate=0.0013, dup_frac=0.2))
        run_config("bigk51_3g", lambda: cli_config(
            "bigk51_3g", 50_000_000, 60, 150, 51, seed=8,
            extra_args=("-max-memory", "8000"), check=True,
            repeat_frac=0.05, err_rate=0.0002))
    if skipped:
        out["skipped_over_budget"] = skipped

    head = out.get("headline", {})
    print(json.dumps({
        "metric": "canonical_kmers_counted_per_sec_per_chip",
        "value": head.get("kmers_per_sec", 0),
        "unit": "kmers/s",
        "vs_baseline": round(
            head.get("kmers_per_sec", 0) / BASELINE_KMERS_PER_SEC, 3),
        "glued_per_sec": head.get("glued_per_sec", 0),
        "configs": out,
    }))


if __name__ == "__main__":
    main()
