#!/usr/bin/env python3
"""genome-minimizer-2-tpu CLI — the complete genomics VAE pipeline.

Same 7-mode command surface as the reference CLI (/root/reference/main.py:62-715):
``--mode {training, experiment, minimizer, explore, preprocess, sample,
convert-samples}`` with the same flags, driving the TPU-native framework.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from genome_minimizer_2_tpu.utils import directories
from genome_minimizer_2_tpu.utils.config import (
    add_config_arguments,
    get_preset_config,
    setup_experiment_config,
)


def print_banner():
    print(r"""
        ┌──────────────────────────────────────────────────────┐
        │   GENOME MINIMIZER 2 — TPU-NATIVE (JAX/XLA/PALLAS)   │
        └──────────────────────────────────────────────────────┘
        """)


def parse_arguments(argv=None):
    """CLI surface (reference parity: main.py:62-146)."""
    parser = argparse.ArgumentParser(
        description="Run integrated VAE genomics experiments (TPU-native)")
    parser.add_argument("--mode",
                        choices=["training", "experiment", "minimizer", "explore",
                                 "preprocess", "sample", "convert-samples",
                                 "pipeline"],
                        default="training",
                        help="Run mode ('pipeline' = streaming sample->convert->"
                             "minimize, an extension over the reference)")
    parser.add_argument("--chunk-size", type=int, default=512,
                        help="Pipeline/sampling device chunk size; also the "
                             "row-chunk size for streaming convert-samples "
                             "over memory-mapped mask files (0 = whole-file)")
    parser.add_argument("--transfer", choices=["auto", "packed", "feature-bits"],
                        default="auto",
                        help="Pipeline device->host transfer: 'packed' gene "
                             "bitmasks (default via auto) or 'feature-bits' "
                             "(~14x less link traffic; for link-bound rigs)")
    parser.add_argument("--preset", choices=["v0", "v1", "v2", "v3"], default="v3",
                        help="Which model preset to run (for training mode)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="Override number of epochs")
    parser.add_argument("--model-path", type=str,
                        help="Path to trained model checkpoint (.npz) for sampling")
    parser.add_argument("--genome-path", type=str,
                        default=directories.wild_type_sequence(),
                        help="Path to GenBank genome file (.gb or .genbank)")
    parser.add_argument("--genes-path", type=str,
                        help="Path to numpy file containing gene lists (.npy), or "
                             "the essential-positions pickle for sample mode")
    parser.add_argument("--output-dir", type=str, default="./minimized_genomes",
                        help="Output directory for minimized genomes (multiple files)")
    parser.add_argument("--output-file", type=str,
                        help="Output file path for single combined FASTA file")
    parser.add_argument("--single-file", action="store_true",
                        help="Generate single FASTA file instead of multiple files")
    parser.add_argument("--model-name", type=str, default="default",
                        help="Model name for file naming (genome minimizer)")
    parser.add_argument("--num-samples", type=int, default=1,
                        help="Number of samples to generate")
    parser.add_argument("--sampling-mode", choices=["default", "focused"],
                        default="default", help="Sampling mode")
    parser.add_argument("--save-dtype", choices=["float32", "uint8", "packed"],
                        default="float32",
                        help="Format of the sample-mode binary_samples "
                             "artifact (float32 .npy = reference-compatible; "
                             "uint8 .npy is 4x smaller; 'packed' writes the "
                             "bitmask .npz directly — ~32x smaller, 0.69 GB "
                             "at 100k scale — converters accept all three)")
    parser.add_argument("--noise-level", type=float, default=0.1,
                        help="Noise level for focused sampling")
    parser.add_argument("--no-merge", action="store_true",
                        help="Pipeline mode, multi-host: keep each host's "
                             "FASTA shard (output_file.shard{K}) instead of "
                             "the host-0 serial merge — pod-scale runs can "
                             "consume per-shard files directly")
    parser.add_argument("--no-csv", action="store_true",
                        help="Sample mode: skip the genes x samples CSV "
                             "(11 GB at the 100k north-star scale)")
    parser.add_argument("--force-reprocess", action="store_true",
                        help="Force reprocessing of essential gene positions")
    parser.add_argument("--seed", type=int, default=0, help="PRNG seed")

    known_args, _ = parser.parse_known_args(argv)
    if known_args.mode == "experiment":
        add_config_arguments(parser)
    else:
        # mesh flags for the non-experiment modes (experiment gets them from
        # the full config group above): preset training consumes both axes,
        # sample/pipeline shard decode chunks over the data axis
        parser.add_argument("--data-parallel", type=int, default=1,
                            help="Mesh data-axis size (0 = all devices)")
        parser.add_argument("--model-parallel", type=int, default=1,
                            help="Mesh model-axis size (training only)")
    return parser.parse_args(argv)


def _sampling_mesh(args):
    """('data',)-only mesh for sample/pipeline modes, or None."""
    dp = getattr(args, "data_parallel", 1) or None  # 0 -> all devices
    if dp == 1:
        return None
    from genome_minimizer_2_tpu.parallel.mesh import make_mesh

    return make_mesh(data=dp, model=1)


def check_data_availability() -> bool:
    """(reference: main.py:149-170)"""
    required = {
        "Main Dataset": directories.ten_k_dataset(),
        "Phylogroups": directories.ten_k_dataset_phylogroups(),
        "Essential Genes": directories.paper_essential_genes(),
    }
    missing = [f"{name}: {path}" for name, path in required.items()
               if not os.path.exists(path)]
    if missing:
        print("✗  Missing required data files:")
        for f in missing:
            print(f"   - {f}")
        print("- Please ensure all data files are in the correct locations.")
        print("- (Point GM2_ROOT at a directory containing data/, or generate a")
        print("  synthetic tree: python -m genome_minimizer_2_tpu.data.synthetic)")
        return False
    print("✓ All required data files found")
    return True


def run_data_exploration() -> bool:
    print("\n" + "=" * 80)
    print("DATA EXPLORATION AND ANALYSIS")
    print("=" * 80)
    try:
        from genome_minimizer_2_tpu.explore import exploration
        exploration.main()
        print("✓ Data exploration completed successfully")
        return True
    except Exception as e:
        print(f"✗ Error during data exploration: {e}")
        import traceback
        traceback.print_exc()
        return False


def run_preprocessing(force_reprocess: bool = False) -> bool:
    print("\n" + "=" * 80)
    print("DATA PREPROCESSING")
    print("=" * 80)
    positions_path = directories.essential_genes_positions()
    if os.path.exists(positions_path) and not force_reprocess:
        print(f"✓ Essential gene positions already exist: {positions_path}")
        print("Use --force-reprocess to regenerate\n")
        return True
    try:
        from genome_minimizer_2_tpu.explore import essential_genes
        essential_genes.main()
        print("✓ Essential gene positions generated successfully")
        print(f"Saved to: {positions_path}\n")
        return True
    except Exception as e:
        print(f"✗ Error during preprocessing: {e}")
        import traceback
        traceback.print_exc()
        return False


def run_sampling(args) -> bool:
    """Sampling + analysis plots + saves (reference: main.py:219-446)."""
    print("\n" + "=" * 80)
    print("MODEL SAMPLING")
    print("=" * 80)
    if not args.model_path:
        print("✗ Model path required for sampling mode")
        return False
    if not os.path.exists(args.model_path):
        print(f"✗ Model file not found: {args.model_path}")
        return False
    genes_path = args.genes_path or directories.essential_genes_positions()
    if not os.path.exists(genes_path):
        print(f"✗ Essential positions file not found: {genes_path}. "
              "Run preprocessing first.")
        return False

    import jax

    from genome_minimizer_2_tpu.data import dataset as D
    from genome_minimizer_2_tpu.data import split as S
    from genome_minimizer_2_tpu.eval import visualise as V
    from genome_minimizer_2_tpu.sample import sampler as SMP
    from genome_minimizer_2_tpu.utils import torch_import as TI
    from genome_minimizer_2_tpu.utils.profiling import Throughput

    print("Loading dataset...")
    matrix = D.load_matrix()
    with open(genes_path, "rb") as f:
        essential_gene_positions = pickle.load(f)

    sp = S.three_way_split(matrix.n_samples, 0.3, 0.3333, 12345)
    test_x = matrix.data[sp.test_idx]
    test_labels = matrix.phylogroups[sp.test_idx]

    print(f"Detected input dimension: {matrix.n_genes}")
    print(f"Loading model from: {args.model_path}")
    # reference .pt state_dicts load directly (converted+cached in a torch
    # subprocess — reference main.py:285-319)
    model_path = TI.ensure_npz(args.model_path)
    if model_path != args.model_path:
        print(f"✓ Converted torch checkpoint -> {model_path}")
    sampler, config = SMP.load_sampler(model_path, input_dim=matrix.n_genes,
                                       mesh=_sampling_mesh(args))
    model_name = config.trainer_version

    output_dir = (directories.project_root() / "models" / f"{model_name}_model"
                  / "sampling_results")
    output_dir.mkdir(parents=True, exist_ok=True)
    print(f"✓ Created output_dir: {output_dir}")

    print(f"\n{'=' * 80}")
    print("Sampling Configuration:")
    print(f"- Model: {Path(args.model_path).name}")
    print(f"- Architecture: {matrix.n_genes} -> {config.hidden_dim} -> {config.latent_dim}")
    print(f"- Samples: {args.num_samples}")
    print(f"- Mode: {args.sampling_mode}")
    print(f"- Output: {output_dir}")
    print(f"{'=' * 80}")

    # Bounded memory at the 100k north-star scale: samples stay PACKED
    # (N, ceil(D/8) ≈ 0.69 GB at 100k) end-to-end; sizes/essential counts/
    # saves all derive from the bitmask without materializing the dense
    # (N, 55k) matrix (~5.5 GB uint8, ~22 GB as the f32 .npy).
    meter = Throughput()
    key = jax.random.key(args.seed)
    # per-chunk analytics run inside the decode loop: genome sizes and
    # essential counts are computed while the device decodes/transfers the
    # chunks ahead, so the (host-side) analyze work hides inside the
    # transfer-bound sampling phase instead of serializing after it
    counter = SMP.make_essential_counter_packed(essential_gene_positions,
                                                width=matrix.n_genes)
    size_parts, ess_parts = [], []

    def analyze_chunk(lo, hi, chunk):
        size_parts.append(SMP.popcount_rows(chunk))
        ess_parts.append(counter(chunk))

    with meter.phase("sample+analyze", args.num_samples):
        if args.sampling_mode == "default":
            print("Generating default samples...")
            packed, z = sampler.sample_packed(key, args.num_samples,
                                              on_chunk=analyze_chunk)
        else:
            print("Generating focused samples...")
            packed, z = sampler.sample_focused_packed(
                key, args.num_samples, noise_level=args.noise_level,
                on_chunk=analyze_chunk)
        genome_sizes = np.concatenate(size_parts) if size_parts else \
            np.zeros(0, np.int64)
        essential_counts = np.concatenate(ess_parts) if ess_parts else \
            np.zeros(0, int)
    print("\n✓ Sampling Results:")
    print(f"- Generated samples: {packed.shape[0]}")
    print(f"- Median genome size: {np.median(genome_sizes):.0f} genes")
    print(f"- Genome size range: {np.min(genome_sizes):.0f} - {np.max(genome_sizes):.0f}")
    print(f"- Median essential genes: {np.median(essential_counts):.0f}")
    print(f"- Essential range: {np.min(essential_counts):.0f} - {np.max(essential_counts):.0f}")

    print("\nGenerating analysis plots...")
    V.plot_samples_distribution(
        genome_sizes,
        str(output_dir / f"{model_name}_genome_size_distribution_{args.sampling_mode}.pdf"),
        "dodgerblue", 3000, 5000)
    V.plot_essential_genes_distribution(
        essential_counts,
        str(output_dir / f"{model_name}_essential_genes_distribution_{args.sampling_mode}.pdf"),
        "violet", int(np.min(essential_counts) * 0.9),
        int(np.max(essential_counts) * 1.1))
    V.plot_essential_vs_total(
        essential_counts, genome_sizes,
        str(output_dir / f"{model_name}_essential_vs_total_{args.sampling_mode}.pdf"))

    print("Analyzing latent space...")
    latents = sampler.encode_means(test_x)
    V.plot_latent_space_pca(latents, test_labels, config, str(output_dir),
                            n_components=2)

    print("Saving results...")
    # Streaming writers, byte-identical to the dense np.save/pandas path
    # (tested in test_sampler.py). float32 (not float64): at 100k x 55k the
    # reference's float64 .npy would be 44 GB; converters accept any dtype.
    with meter.phase("save", args.num_samples):
        if args.save_dtype == "packed":
            from genome_minimizer_2_tpu.genome.converter import save_packed_npz

            save_packed_npz(
                packed, matrix.n_genes,
                str(output_dir
                    / f"{model_name}_binary_samples_{args.sampling_mode}.npz"))
        else:
            SMP.save_binary_npy_stream(
                packed, matrix.n_genes,
                str(output_dir
                    / f"{model_name}_binary_samples_{args.sampling_mode}.npy"),
                dtype=np.dtype(args.save_dtype))
        if not args.no_csv:
            SMP.write_samples_csv_stream(
                packed, matrix.genes,
                str(output_dir / f"{model_name}_data_full_samples_df.csv"))
    print("\n✓ SAMPLING COMPLETE!")
    print(f"- Results saved to: {output_dir}")
    print(meter.report())
    return True


def run_single_experiment(args):
    """Preset training experiment (reference: main.py:449-493)."""
    print("\n" + "=" * 80)
    print("TRAINING EXPERIMENT RUN")
    print("=" * 80)
    from genome_minimizer_2_tpu.experiments import IntegratedExperimentRunner

    config = get_preset_config(args.preset)
    if args.epochs:
        config.n_epochs = args.epochs
    config.seed = args.seed
    config.data_parallel = getattr(args, "data_parallel", 1)
    config.model_parallel = getattr(args, "model_parallel", 1)

    print(f"\n{'=' * 80}")
    print(f"Running {config.experiment_name} experiment")
    print(f"Hidden dim: {config.hidden_dim}, Latent dim: {config.latent_dim}")
    print(f"Epochs: {config.n_epochs}, Trainer: {config.trainer_version}")
    print(f"{'=' * 80}")

    runner = IntegratedExperimentRunner(config)
    results = runner.run_complete_experiment()
    print(f"\n{config.experiment_name.upper()} COMPLETED!")
    if "f1_overall" in results:
        print(f"F1 Score: {results['f1_overall']:.3f}")
        print(f"Accuracy: {results['accuracy_overall']:.3f}")
    return results


def run_custom_experiment(args):
    """Custom-config experiment (reference: main.py:496-526)."""
    print("\n" + "=" * 80)
    print("CUSTOM EXPERIMENT RUN")
    print("=" * 80)
    from genome_minimizer_2_tpu.experiments import IntegratedExperimentRunner

    config = setup_experiment_config(args)
    print(f"\n{'=' * 80}")
    print(f"Running {config.experiment_name} experiment")
    print(f"Hidden dim: {config.hidden_dim}, Latent dim: {config.latent_dim}")
    print(f"Epochs: {config.n_epochs}, Trainer: {config.trainer_version}")
    print(f"{'=' * 80}")
    runner = IntegratedExperimentRunner(config)
    results = runner.run_complete_experiment()
    print(f"\n{config.experiment_name.upper()} COMPLETED!")
    if "f1_overall" in results:
        print(f"F1 Score: {results['f1_overall']:.3f}")
        print(f"Accuracy: {results['accuracy_overall']:.3f}")
    return results


def run_genome_minimizer(args):
    """Genome minimizer mode (reference: main.py:528-615)."""
    print("\n" + "=" * 80)
    print("GENOME MINIMIZER RUN")
    print("=" * 80)
    if not os.path.exists(args.genome_path):
        print(f"✗ Genome file not found: {args.genome_path}")
        return None
    if not args.genes_path:
        print("✗ Genes path required for genome minimizer")
        return None
    if not os.path.exists(args.genes_path):
        print(f"✗ Genes file not found: {args.genes_path}")
        return None

    from genome_minimizer_2_tpu.genome.minimizer import (
        process_multiple_genomes_multiple_files,
        process_multiple_genomes_single_file,
    )
    from genome_minimizer_2_tpu.utils.profiling import Throughput

    print(f"\n{'=' * 80}")
    print(f"Processing genome: {Path(args.genome_path).name}")
    print(f"Using genes from: {Path(args.genes_path).name}")
    print(f"Model name: {args.model_name}")
    print(f"{'=' * 80}")

    if args.output_file:
        output_dir = Path(args.output_file).parent
        output_filename = Path(args.output_file).name
    elif args.single_file:
        output_dir = Path(args.output_dir)
        output_filename = f"minimized_genomes_{args.model_name}.fasta"
    else:
        output_dir = Path(args.output_dir)
        output_filename = None
    output_dir.mkdir(parents=True, exist_ok=True)
    print(f"✓ Created output directory: {output_dir}")

    meter = Throughput()
    import time as _time

    t0 = _time.perf_counter()
    if args.single_file or args.output_file:
        output_file = output_dir / output_filename
        print(f"Generating single FASTA file: {output_file}")
        result = process_multiple_genomes_single_file(
            genome_path=args.genome_path, genes_path=args.genes_path,
            model_name=args.model_name, output_file=str(output_file))
        print("\n✓ GENOME MINIMIZATION COMPLETED!")
        print(f"- Single file generated: {output_file}")
    else:
        print(f"Generating multiple files in: {output_dir}")
        result = process_multiple_genomes_multiple_files(
            genome_path=args.genome_path, genes_path=args.genes_path,
            model_name=args.model_name, output_dir=str(output_dir))
        print("\n✓ GENOME MINIMIZATION COMPLETED!")
    meter.add("minimize", result["genome_count"], _time.perf_counter() - t0)
    print(f"- Processed: {result['genome_count']} genomes")
    print(f"- Average percentage reduction: {result['average_reduction_pct']:.1f}%")
    print(f"- Average genome length: {result['average_length_bp']:,.1f} bp")
    print(f"- Throughput: {meter.report()}")
    return result


def run_binary_converter(args) -> bool:
    """convert-samples mode (reference: main.py:617-645)."""
    from genome_minimizer_2_tpu.data.dataset import load_gene_vocab
    from genome_minimizer_2_tpu.genome.converter import (
        convert_samples_streaming,
        load_essential_set,
    )

    if not args.genes_path:
        print("✗ --genes-path is required in convert-samples mode (input masks .npy)")
        return False
    if not os.path.exists(args.genes_path):
        print(f"✗ Input masks file not found: {args.genes_path}")
        return False

    out_path = args.output_file or "seq_out.npy"
    # gene vocabulary only — never the ~2 GB presence matrix the reference
    # re-parses here (/root/reference/main.py:627-631); cache-backed
    cols = load_gene_vocab()
    print(f"Gene vocabulary: {len(cols)} genes")

    # both outputs stream (no per-row Python lists held live — at 100k scale
    # the staged path holds 3+ GB of list slots per output); packed .npz
    # masks artifacts are ingested without dense expansion
    essential_set = load_essential_set(directories.paper_essential_genes())
    out_path, filled_path, _ = convert_samples_streaming(
        args.genes_path, cols, out_path, essential_set=essential_set,
        chunk_size=args.chunk_size or 1024)
    print("✓ Binary conversion complete")
    print(f"- Gene lists: {out_path}")
    print(f"- Gene lists (essentials filled): {filled_path}")
    return True


def run_pipeline(args) -> bool:
    """Streaming sample -> convert -> minimize (new capability; bounded
    memory at 100k-genome scale, per-host sharding)."""
    print("\n" + "=" * 80)
    print("STREAMING SAMPLE->CONVERT->MINIMIZE PIPELINE")
    print("=" * 80)
    if not args.model_path or not os.path.exists(args.model_path):
        print("✗ --model-path required (trained checkpoint)")
        return False
    if not os.path.exists(args.genome_path):
        print(f"✗ Genome file not found: {args.genome_path}")
        return False

    import jax
    import pandas as pd

    from genome_minimizer_2_tpu.data.dataset import load_gene_vocab
    from genome_minimizer_2_tpu.genome.minimizer import MinimizerEngine
    from genome_minimizer_2_tpu.pipeline import sample_and_minimize
    from genome_minimizer_2_tpu.sample import sampler as SMP

    cols = load_gene_vocab()  # cache-backed; no presence-matrix parse

    ess = pd.read_csv(directories.paper_essential_genes())
    col = "# gene" if "# gene" in ess.columns else "gene"
    essential_set = set(ess[col].astype(str).str.strip())

    from genome_minimizer_2_tpu.utils import torch_import as TI

    model_path = TI.ensure_npz(args.model_path)  # reference .pt accepted
    if model_path != args.model_path:
        print(f"✓ Converted torch checkpoint -> {model_path}")
    sampler, config = SMP.load_sampler(model_path, input_dim=len(cols),
                                       mesh=_sampling_mesh(args))
    engine = MinimizerEngine.from_genbank(args.genome_path)
    out = args.output_file or f"minimized_genomes_{args.model_name}.fasta"

    stats = sample_and_minimize(
        sampler, engine, cols, essential_set, args.num_samples, out,
        key=jax.random.key(args.seed), chunk_size=args.chunk_size,
        model_name=args.model_name, transfer=args.transfer,
        sampling_mode=args.sampling_mode, noise_level=args.noise_level,
        merge=not args.no_merge)
    if args.no_merge and jax.process_count() > 1:
        from genome_minimizer_2_tpu.parallel.barrier import shard_file

        print(f"\n✓ PIPELINE COMPLETE: {stats.genomes} genomes -> "
              f"{shard_file(out, jax.process_index())} (per-shard output, "
              "no host-0 merge)")
    else:
        print(f"\n✓ PIPELINE COMPLETE: {stats.genomes} genomes -> {out}")
    print(f"- Throughput: {stats.rate():.1f} genomes/s whole-run, "
          f"{stats.steady_rate():.1f} genomes/s steady-state "
          f"(sample {stats.sample_s:.1f}s, "
          f"convert+minimize {stats.minimize_s:.1f}s, "
          f"total {stats.total_s:.1f}s)")
    return True


def main(argv=None) -> int:
    args = parse_arguments(argv)
    print_banner()
    import jax

    # Optional platform pin (e.g. GM2_PLATFORM=cpu): must happen before any
    # backend instantiation. The env var JAX_PLATFORMS alone does not win on
    # rigs whose sitecustomize force-registers a platform list.
    plat = os.environ.get("GM2_PLATFORM")
    if plat and not jax.distributed.is_initialized():
        jax.config.update("jax_platforms", plat)
    # Multi-host bring-up: on a pod every host runs this same CLI and the
    # cluster forms HERE, before anything touches a backend (initialize after
    # backend instantiation is a hard error). Single host: no-op.
    from genome_minimizer_2_tpu.parallel.distributed import maybe_initialize

    distributed = maybe_initialize()
    mode_line = f"\nRunning in {args.mode} mode on {jax.default_backend()}"
    if distributed:
        mode_line += (f" (process {jax.process_index() + 1}/"
                      f"{jax.process_count()}, "
                      f"{len(jax.devices())} global devices)")
    print(mode_line)

    if args.mode in ["training", "experiment", "explore", "preprocess", "sample",
                     "pipeline"]:
        if not check_data_availability():
            print("\n✗ Cannot proceed without required data files")
            return 1

    results = None
    try:
        if args.mode == "explore":
            return 0 if run_data_exploration() else 1
        elif args.mode == "preprocess":
            return 0 if run_preprocessing(args.force_reprocess) else 1
        elif args.mode == "sample":
            return 0 if run_sampling(args) else 1
        elif args.mode == "training":
            results = run_single_experiment(args)
        elif args.mode == "experiment":
            results = run_custom_experiment(args)
        elif args.mode == "minimizer":
            results = run_genome_minimizer(args)
        elif args.mode == "convert-samples":
            results = run_binary_converter(args)
        elif args.mode == "pipeline":
            results = run_pipeline(args) or None
    except KeyboardInterrupt:
        print("\n\n✗ Process interrupted by user")
        return 1
    except Exception as e:
        print(f"\n✗ Unexpected error: {e}")
        import traceback
        traceback.print_exc()
        return 1

    print("\n" + "=" * 80)
    print("PROCESS COMPLETED!")
    print("=" * 80)
    return 0 if results is not None else 1


if __name__ == "__main__":
    exit(main())
