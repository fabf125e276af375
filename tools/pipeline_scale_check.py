#!/usr/bin/env python3
"""North-star scale check: `--mode pipeline --num-samples 100000` end-to-end.

Round-3 VERDICT next #2: the 100k-genome target had only ever been
extrapolated from 2,048-genome bench runs. This drives the ACTUAL CLI
(main.main, pipeline mode) at the north-star sample count against a
real-dimension synthetic tree — 55,039 gene columns, a 4.6 Mbp genome with
~4,300 gene features of 300-1,500 bp (E. coli K-12 proportions, the bench
engine's scale) — and records wall time, whole-run + steady rates, peak
RSS, and the whole-run/steady ratio (the amortization claim: production
runs amortize the post-compile host-degradation windows).

Storage: a minimized genome at this scale is ~2.7 MB of FASTA, so 100k of
them is ~270 GB — more than this rig's disk+RAM combined. Production pods
stream shards to downstream storage (BASELINE.md pod projection); here a
consumer thread stands in for that sink: it punches holes
(fallocate(FALLOC_FL_PUNCH_HOLE)) in the already-written prefix of the
output file, keeping resident bytes bounded (~2 GB) while every byte still
flows through the real writer path (mmap/pwrite + msync). Pass --keep to
disable for sample counts that fit.

Usage: python tools/pipeline_scale_check.py [N] [--keep] [--chunk C]
"""

from __future__ import annotations

import argparse
import ctypes
import os
import resource
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

D, H, L = 55039, 1024, 64
GENOME_LEN = 4_600_000
N_FEATURES = 4_300

FALLOC_FL_KEEP_SIZE = 0x01
FALLOC_FL_PUNCH_HOLE = 0x02
_libc = ctypes.CDLL("libc.so.6", use_errno=True)


def _punch(fd: int, offset: int, length: int) -> None:
    r = _libc.fallocate(fd, FALLOC_FL_PUNCH_HOLE | FALLOC_FL_KEEP_SIZE,
                        ctypes.c_long(offset), ctypes.c_long(length))
    if r != 0:
        raise OSError(ctypes.get_errno(), "fallocate(PUNCH_HOLE)")


class HolePuncher(threading.Thread):
    """Frees the written prefix of ``path``, keeping the last ``window``
    bytes resident (the writer's active mmap region is never touched)."""

    def __init__(self, path: str, window: int = 2 << 30, period: float = 3.0):
        super().__init__(daemon=True)
        self.path, self.window, self.period = path, window, period
        self.punched = 0
        self.stop_evt = threading.Event()

    def run(self):
        while not self.stop_evt.wait(self.period):
            self._sweep()
        self._sweep()

    def _sweep(self):
        # never die silently: a dead puncher means the stream fills
        # /dev/shm (~300 GB logical at 100k) and the run ENOSPCs late
        try:
            size = os.stat(self.path).st_size
        except FileNotFoundError:
            return
        keep_from = max(0, size - self.window) & ~0xFFF  # 4k-align
        if keep_from > self.punched:
            try:
                fd = os.open(self.path, os.O_RDWR)
                try:
                    _punch(fd, self.punched, keep_from - self.punched)
                finally:
                    os.close(fd)
                self.punched = keep_from
            except OSError as e:
                print(f"[scale] puncher error (will retry): {e}",
                      file=sys.stderr, flush=True)


def build_tree(tmp: str) -> str:
    """Synthetic data root at real dataset dims + an E. coli-proportioned
    genome (gene names drawn from the dataset vocabulary, as in
    bench.py::bench_pipeline)."""
    import numpy as np

    from genome_minimizer_2_tpu.data import synthetic as S

    os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
    pa = os.path.join(tmp, "data", "F4_complete_presence_absence.csv")
    ph = os.path.join(tmp, "data", "accessionID_phylogroup_BD.csv")
    eg = os.path.join(tmp, "data", "essential_genes.csv")
    gb = os.path.join(tmp, "data", "wild_type_sequence.gb")
    genes, samples = S.write_presence_absence_csv(pa, n_samples=48, n_genes=D,
                                                  seed=0)
    S.write_phylogroups_csv(ph, samples, seed=0)
    S.write_essential_genes_csv(eg, genes, n_essential=40, seed=0)

    rng = np.random.RandomState(0)
    seq = "".join(rng.choice(np.array(list("acgt")), size=GENOME_LEN))
    starts1 = np.sort(rng.choice(GENOME_LEN - 2000, size=N_FEATURES,
                                 replace=False)) + 1  # 1-based
    lengths = rng.randint(300, 1500, size=N_FEATURES)
    chosen = rng.choice(len(genes), size=N_FEATURES, replace=False)
    features = []
    for s1, ln, gi in zip(starts1, lengths, chosen):
        e1 = min(int(s1 + ln - 1), GENOME_LEN)
        features.append((f"{int(s1)}..{e1}", genes[int(gi)], int(s1) - 1, e1,
                         f"b{int(gi) % 10000:04d}"))
    S.write_genbank_from_spec(gb, {"seq": seq, "features": features})
    return gb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=100_000)
    ap.add_argument("--keep", action="store_true",
                    help="keep the output FASTA (no hole punching)")
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--root", default="/tmp/gm2pipescale_tree",
                    help="dataset-tree cache dir (built once, reused)")
    ap.add_argument("--sampling-mode", choices=["default", "focused"],
                    default="default",
                    help="streamed focused mode (probe/anchor once, "
                         "per-index noise) at north-star scale")
    args = ap.parse_args()

    import jax

    if os.environ.get("GM2_PLATFORM"):  # e.g. cpu smoke-testing of this tool
        jax.config.update("jax_platforms", os.environ["GM2_PLATFORM"])

    from genome_minimizer_2_tpu.models import vae
    from genome_minimizer_2_tpu.utils import checkpoint as ckpt
    from genome_minimizer_2_tpu.utils.config import get_v0_config

    tmp = args.root
    ck = os.path.join(tmp, "saved_VAE_v0.npz")
    if not os.path.exists(ck):
        print(f"[scale] building synthetic tree at {tmp} "
              f"(D={D}, genome {GENOME_LEN / 1e6:.1f} Mbp, {N_FEATURES} "
              "genes)", flush=True)
        build_tree(tmp)
        cfg = vae.VAEConfig(input_dim=D, hidden_dim=H, latent_dim=L)
        params, stats = vae.init(cfg, jax.random.key(0))
        config = get_v0_config()
        ckpt.save_checkpoint(ck, params, stats, config, extra={"input_dim": D})
        del params, stats
    else:
        print(f"[scale] reusing tree at {tmp}", flush=True)
    os.environ["GM2_ROOT"] = tmp

    import main as cli

    # capture the PipelineStats the CLI's run produces
    import genome_minimizer_2_tpu.pipeline as P

    captured = []
    orig = P.sample_and_minimize

    def capture(*a, **k):
        s = orig(*a, **k)
        captured.append(s)
        return s

    P.sample_and_minimize = capture

    outdir = "/dev/shm" if os.path.isdir("/dev/shm") else tmp
    out = os.path.join(outdir, "pipescale.fasta")

    # one-time compile warmup at the production chunk shape (cached remote
    # compiles are what any production deployment runs with; the claim under
    # test is steady-vs-whole-run on the REAL workload, not compile latency)
    print("[scale] warmup (compile) ...", flush=True)
    rc = cli.main(["--mode", "pipeline", "--model-path", ck,
                   "--num-samples", str(4 * args.chunk),
                   "--output-file", out, "--model-name", "v0",
                   "--chunk-size", str(args.chunk),
                   "--sampling-mode", args.sampling_mode])
    assert rc == 0, "warmup failed"
    captured.clear()
    # keep the warmup output: the timed run rewrites it in place, recycling
    # its materialized pages (native writer write_base mode)

    # steady-state gate (bench.py::_settle_native): the warmup's remote
    # compile degrades this VM's effective CPU for tens of seconds after it
    # finishes; a timed run started inside that window measures the window
    import bench as B

    from genome_minimizer_2_tpu.genome.minimizer import MinimizerEngine

    eng = MinimizerEngine.from_genbank(
        os.path.join(tmp, "data", "wild_type_sequence.gb"))
    B._calibrate_native(eng)
    settle_s, settled = B._settle_native(eng)
    print(f"[scale] settle: {settle_s:.1f}s settled={settled}", flush=True)

    puncher = None
    if not args.keep:
        puncher = HolePuncher(out)
        puncher.start()

    sink0 = B.sink_alloc_gbps()
    print(f"[scale] sink fresh-alloc weather: {sink0:.2f} GB/s "
          "(unbounded streams are sink-bound below ~1.5 GB/s — "
          "bench.sink_alloc_gbps docstring)", flush=True)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    t0 = time.time()
    rc = cli.main(["--mode", "pipeline", "--model-path", ck,
                   "--num-samples", str(args.n), "--output-file", out,
                   "--model-name", "v0", "--chunk-size", str(args.chunk),
                   "--sampling-mode", args.sampling_mode])
    wall = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    st = os.stat(out)
    resident = st.st_blocks * 512 / 1e9
    if puncher is not None:
        puncher.stop_evt.set()
        puncher.join()
    if rc != 0 or not captured:
        # report the underlying CLI failure instead of masking it with an
        # IndexError on the (empty) captured-stats list
        print(f"\n[scale] FAILED: CLI rc={rc}, captured stats: {len(captured)}")
        sys.exit(1)
    s = captured[-1]
    print(f"\n[scale] rc={rc} n={args.n} wall={wall:.0f}s")
    print(f"[scale] whole-run {s.rate():.1f}/s steady {s.steady_rate():.1f}/s "
          f"ratio {s.rate() / s.steady_rate():.2f}")
    print(f"[scale] sample_s={s.sample_s:.1f} minimize_s={s.minimize_s:.1f} "
          f"total_s={s.total_s:.1f} chunks={len(s.chunk_done)}")
    print(f"[scale] output: {st.st_size / 1e9:.1f} GB written, "
          f"{resident:.2f} GB peak-resident (hole-punched consumer)"
          if puncher else
          f"[scale] output: {st.st_size / 1e9:.1f} GB")
    print(f"[scale] peak_rss={rss:.2f} GB (pre-run baseline {rss0:.2f} GB)")
    ok = rc == 0 and s.genomes == args.n and rss < 4.0
    print(f"[scale] {'OK' if ok else 'FAILED'} (rss<4GB criterion)")
    os.remove(out)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
