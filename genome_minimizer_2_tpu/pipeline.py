"""Streaming sample -> convert -> minimize pipeline.

The reference runs its three generation stages as separate CLI invocations
that materialize full dense intermediates on disk (binary_samples.npy — at
100k samples x 55k genes that is ~44 GB as float64). This module fuses the
stages into a bounded-memory stream, per BASELINE.json config 5 ("pod-scale
batch design"): each chunk of latents is decoded to packed bitmasks on the
TPU (Pallas fused decode+threshold+bitpack, 8x smaller transfer), fed
straight to the native C++ minimize workers (converter fused in), and
appended to a FASTA shard. A ``transfer="feature-bits"`` opt-in shrinks the
link traffic a further ~14x for link-bound deployments (see
``sample_and_minimize``). Hosts partition the sample axis and host 0 merges
shards in process order (byte-identical to single-host output).

Semantics match the staged reference pipeline exactly: sampling thresholds
strictly (>0.5), conversion's >=0.5 is a no-op on binary masks, dedupe keeps
first-occurrence columns, essentials are set-union + sorted per sample, and
FASTA records are '>Minimized_E_coli_K12_MG1655_{i+1}\\n{seq}\\n'.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from collections import deque
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .core.prng import draw_latents
from .genome.converter import dedupe_columns
from .genome.minimizer import MinimizerEngine
from .ops.pallas_kernels import unpack_bits
from .sample.sampler import Sampler

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class PipelineStats:
    """Per-phase wall time. The converter is fused into the native minimize
    workers (no separate convert phase), so its time is part of minimize_s."""

    genomes: int = 0
    sample_s: float = 0.0
    minimize_s: float = 0.0
    total_s: float = 0.0
    # (perf_counter, genomes) at each chunk's minimize completion, in
    # completion order — the steady-state observability hook.
    chunk_done: list = dataclasses.field(default_factory=list)

    def rate(self) -> float:
        return self.genomes / max(self.total_s, 1e-9)

    def steady_rate(self) -> float:
        """Median per-chunk throughput (genomes / inter-completion gap).

        The whole-run ``rate()`` folds in startup and any transient host
        stall that happens to overlap a short run; the median completion
        gap is the sustained streaming rate a long production run (which
        amortizes such windows over minutes) actually achieves. Falls back
        to ``rate()`` when there are too few chunks to form a median."""
        if len(self.chunk_done) < 4:
            return self.rate()
        gaps = [
            (t1 - t0, g1)
            for (t0, _), (t1, g1) in zip(self.chunk_done, self.chunk_done[1:])
            if t1 > t0
        ]
        if not gaps:
            return self.rate()
        rates = sorted(g / dt for dt, g in gaps)
        return rates[len(rates) // 2]


def sample_and_minimize(
    sampler: Sampler,
    engine: MinimizerEngine,
    cols: Sequence[str],
    essential_set: set[str],
    num_samples: int,
    output_file: str,
    key=None,
    chunk_size: int = 512,
    model_name: str = "pipeline",
    process_index: int | None = None,
    process_count: int | None = None,
    merge: bool = True,
    write_header: bool = True,
    prefetch: int = 2,
    transfer: str = "auto",
    native_threads: int | None = None,
    overlap: bool = True,
    sampling_mode: str = "default",
    noise_level: float = 0.1,
    n_probes: int = 100,
) -> PipelineStats:
    """Stream ``num_samples`` synthetic genomes into ``output_file``.

    Multi-host: each host handles samples [pi*n/pc, (pi+1)*n/pc) into
    ``output_file.shard{pi}``; host 0 merges. Single host writes directly.

    ``sampling_mode``: ``"default"`` derives z_i = normal(fold_in(key, i));
    ``"focused"`` (the reference's /root/reference/main.py:350-370, streamed)
    runs the probe/anchor stage ONCE (Sampler.focused_anchor — ``n_probes``
    dense probes, min-gene anchor via output-space distances), then streams
    z_i = z* + noise_level * normal(fold_in(noise_key, i)) through the same
    bounded-memory packed path — bit-identical to the staged
    ``sample_focused_packed`` + convert + minimize at the same key, but
    without the tens-of-GB dense intermediates at 100k scale (round-4
    VERDICT missing #2). Every host derives the same anchor (deterministic
    probe stage), so shard boundaries still never change results.

    ``transfer`` selects what crosses the device->host link per chunk:
    ``"packed"`` ships the full packed gene bitmask (ceil(D/8) bytes/genome,
    converter fused into the native minimize workers); ``"feature-bits"``
    ships only the per-GenBank-feature keep decisions (ceil(F/8)
    bytes/genome — ~14x less at E. coli scale, gathered on device from the
    same packed mask so the output is byte-identical). ``"auto"`` currently
    resolves to packed: A/B on this rig (tools/probe_pipeline_transfer.py,
    alternating runs) showed the pipeline is bound by the native minimize
    under TPU-client CPU contention, not by the link — packed medians ~89/s
    vs feature-bits ~62/s (the host-side unpack adds work to the bound
    resource). feature-bits is the right choice when the link is genuinely
    the wall (e.g. many host cores + DCN-attached accelerators); it stays a
    supported opt-in.

    ``overlap`` selects the execution schedule. ``True`` (default):
    software-pipelined — the TPU decodes chunks ahead (``prefetch``) while
    one worker thread runs the native convert+minimize. ``False``: strictly
    serial per chunk — decode+transfer, then minimize while the device is
    idle (a measurement/debug mode).

    ``native_threads``: worker threads for the native minimize per chunk;
    ``None``/0 = every core. Round 3 measured all-cores COLLAPSING under
    overlap (128-212/s vs 601/s at cores-1) and defaulted to cores-1 — but
    round 4 root-caused that collapse to the host's page-allocation
    pathology (kernel-serialized fault storms, BASELINE.md), not to CPU
    contention with the accelerator client. With the in-place rewrite
    (resident pages), the same A/B inverts: 2 workers 1,412-1,539/s and
    all-cores 1,515-1,668/s vs 991-1,066/s at 1 worker (2048 genomes x3
    trials, settled) — the sweep scales with cores once the kernel is out
    of the way. Default: all cores.
    """
    key = jax.random.key(0) if key is None else key
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count

    if sampling_mode not in ("default", "focused"):
        raise ValueError(f"unknown sampling_mode {sampling_mode!r}")
    anchor = None
    if sampling_mode == "focused":
        # same key split as Sampler.sample_focused_packed: the staged and
        # streamed focused paths are bit-identical at the same key
        probe_key, key = jax.random.split(key)
        anchor = jnp.asarray(sampler.focused_anchor(probe_key, n_probes),
                             jnp.float32)

    cols_arr, keep_mask = dedupe_columns(np.asarray(cols))
    if keep_mask.size != sampler.cfg.input_dim:
        raise ValueError(
            f"column count {keep_mask.size} != model input dim "
            f"{sampler.cfg.input_dim}")
    # Converter fused into the native minimize workers: per-feature column
    # index (original column space) + essential flag computed once; each
    # chunk's PACKED bitmask feeds the C++ core directly — the host never
    # unpacks masks or materializes drop matrices. Equivalent to building
    # each sample's sorted gene list and testing feature membership (tested
    # vs the staged path in test_pipeline.py).
    col_idx, ess_flags = engine.feature_lookup_packed(cols_arr, keep_mask,
                                                      essential_set)

    n_features = int(col_idx.size)
    if transfer not in ("auto", "packed", "feature-bits"):
        raise ValueError(f"unknown transfer mode {transfer!r}")
    if transfer == "auto":
        transfer = "packed"  # measured default on this rig — see docstring
    feature_bits = transfer == "feature-bits"
    decode_features = (sampler.make_feature_decoder(col_idx, ess_flags)
                       if feature_bits else None)

    lo_all = pi * num_samples // pc
    hi_all = (pi + 1) * num_samples // pc

    from .parallel import barrier

    sharded = pc > 1
    shard_path = barrier.shard_file(output_file, pi) if sharded else output_file
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
    if sharded:
        # a previous --no-merge run leaves its completeness sentinels for
        # downstream consumers; a NEW stream over the same path must retract
        # its own stale sentinel BEFORE the in-place rewrite begins, or a
        # concurrent merger/consumer could read this shard mid-rewrite (new
        # records up to the current offset + plausible stale tail) as done
        try:
            os.remove(shard_path + ".done")
        except FileNotFoundError:
            pass

    stats = PipelineStats()
    t_start = time.perf_counter()
    header = b""
    if write_header and not sharded:
        header = (f"# Minimized genomes generated using model: {model_name}\n"
                  f"# Total genomes: {num_samples}\n"
                  f"# Generated on: {np.datetime64('now')}\n").encode()
    # In-place stream: the header is written without truncating, and every
    # chunk lands at an explicit byte offset (native write_base mode), so a
    # previous output's already-materialized pages are REWRITTEN rather
    # than freed and re-allocated. Fresh page allocation on memory-
    # overcommitted hosts measured up to ~40x slower than resident stores
    # (0.1 vs 4.5 GB/s — BASELINE.md round 4); recycling makes re-runs and
    # repeated benchmarks measure the pipeline, not the host's memory
    # weather. One truncate at stream end cuts any stale tail.
    if not os.path.exists(shard_path):
        open(shard_path, "wb").close()
    with open(shard_path, "r+b") as hf:
        hf.write(header)
    next_off = len(header)
    # grow-only stream invariant: after every chunk the file size must be
    # exactly max(initial size, our computed end offset) — the native writer
    # sizes the file to its own offset arithmetic, so this catches any drift
    # between engine.record_bytes and gm2min.cpp's layout at the first chunk
    # it happens, instead of silently corrupting stream offsets mid-file
    size0 = max(os.path.getsize(shard_path), len(header))

    latent_dim = sampler.cfg.latent_dim

    # Software pipelining: the latents never leave the device (z is drawn
    # and decoded in one dispatch chain), and up to ``prefetch`` chunks are
    # enqueued ahead so the TPU decodes chunk k+1..k+P while the host
    # converts/minimizes chunk k. sample_s below therefore measures time
    # *blocked on* the device+transfer, not device time itself.
    spans = [(lo, min(lo + chunk_size, hi_all))
             for lo in range(lo_all, hi_all, chunk_size)]

    def submit(span):
        lo, hi = span
        # fixed chunk_size shapes end-to-end (indices AND decode) so the tail
        # chunk reuses the steady-state compiled programs; rows >= hi are
        # decoded but trimmed by unpack_packed(rows=hi-lo) below
        idx = jnp.arange(lo, lo + chunk_size)
        z = draw_latents(key, idx, latent_dim)
        if anchor is not None:  # focused: z* + noise_level * noise_i
            z = anchor + jnp.float32(noise_level) * z
        dev = (decode_features(z) if feature_bits
               else sampler.decode_packed_device(z))
        # start the device->host copy NOW (it proceeds as soon as the decode
        # finishes) so the transfer of chunk k+1 overlaps chunk k's native
        # minimize instead of serializing with it at drain time — on the
        # high-latency tunneled link this is the difference between paying
        # the round trip once per chunk and hiding it entirely
        try:
            dev.copy_to_host_async()
        except Exception:  # backend without async D2H: drain() still works
            pass
        return lo, hi, dev

    if native_threads is None:
        native_threads = 0  # all cores — A/B-measured default (docstring)

    def minimize_chunk(arr, lo, hi):
        nonlocal next_off
        t0 = time.perf_counter()
        if feature_bits:
            keep = unpack_bits(arr, n_features)
            lens = engine.minimize_drop_to_fasta(1 - keep, shard_path,
                                                 start_index=lo,
                                                 write_base=next_off,
                                                 n_threads=native_threads)
        else:
            lens = engine.minimize_packed_to_fasta(arr, col_idx, ess_flags,
                                                   shard_path, start_index=lo,
                                                   write_base=next_off,
                                                   n_threads=native_threads)
        next_off += engine.record_bytes(lens, start_index=lo)
        actual = os.path.getsize(shard_path)
        if actual != max(size0, next_off):
            raise RuntimeError(
                f"FASTA stream offset drift at chunk [{lo},{hi}): computed "
                f"end {next_off}, writer left size {actual} "
                f"(stream started at {size0})")
        t1 = time.perf_counter()
        stats.minimize_s += t1 - t0
        stats.genomes += hi - lo
        stats.chunk_done.append((t1, hi - lo))

    def drain(dev, lo, hi):
        # -- sample: wait for the packed bitmask of this chunk ------------
        t0 = time.perf_counter()
        packed = np.asarray(dev)[: hi - lo]
        stats.sample_s += time.perf_counter() - t0
        return packed

    try:
        if not overlap:
            # Serial schedule: the accelerator client is quiescent while the
            # native workers own every host core.
            for span in spans:
                lo, hi, dev = submit(span)
                minimize_chunk(drain(dev, lo, hi), lo, hi)
        else:
            it = iter(spans)
            pending: deque = deque()
            for _ in range(min(max(1, prefetch), len(spans))):
                pending.append(submit(next(it)))

            # Three-way overlap: the TPU decodes chunk k+P (async dispatch),
            # the main thread drains chunk k+1's device->host transfer, and
            # ONE worker thread runs chunk k's native convert+minimize (the
            # C++ call releases the GIL; a single ordered worker keeps FASTA
            # appends sequential).
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=1) as pool:
                futures = deque()
                while pending:
                    lo, hi, dev = pending.popleft()
                    nxt = next(it, None)
                    if nxt is not None:
                        pending.append(submit(nxt))

                    packed = drain(dev, lo, hi)
                    futures.append(pool.submit(minimize_chunk, packed, lo, hi))
                    while len(futures) > 2:  # bound buffered chunks
                        futures.popleft().result()
                for f in futures:
                    f.result()
    finally:
        # Stream-end truncate, ALSO on failure: chunks are grow-only (page
        # recycling), so without this a crashed stream over a larger
        # previous output would leave that run's stale records beyond the
        # completed prefix — a plausible-looking but wrong FASTA. next_off
        # only advances past fully-written chunks, so truncating to it
        # leaves a valid prefix on error and the exact output on success.
        with open(shard_path, "r+b") as tf:
            tf.truncate(next_off)

    if sharded:
        barrier.mark_shard_done(shard_path)
    stats.total_s = time.perf_counter() - t_start

    if sharded and merge and pi == 0:
        # sentinel barrier: every host's shard is complete before merging —
        # a straggler host must not produce a truncated FASTA
        import shutil

        shard_paths = barrier.wait_for_shards(output_file, pc)
        with open(output_file, "wb") as out:
            if write_header:
                out.write(
                    f"# Minimized genomes generated using model: "
                    f"{model_name}\n# Total genomes: {num_samples}\n"
                    f"# Generated on: {np.datetime64('now')}\n".encode())
            for sp in shard_paths:
                # streamed copy: a shard at north-star scale is tens of GB —
                # f.read() would materialize it wholesale
                with open(sp, "rb") as f:
                    shutil.copyfileobj(f, out, length=16 << 20)
        barrier.clear_sentinels(output_file, pc)
    logger.info("pipeline: %d genomes in %.2fs (%.1f/s) — sample %.2fs, "
                "convert+minimize %.2fs", stats.genomes, stats.total_s,
                stats.rate(), stats.sample_s, stats.minimize_s)
    return stats
