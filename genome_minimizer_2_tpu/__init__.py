"""genome_minimizer_2_tpu — a TPU-native minimal-genome design engine.

A from-scratch JAX/XLA/Pallas framework with the full capability surface of the
``ucl-cssb/genome-minimizer-2`` pipeline (reference mounted at /root/reference):

- VAE training on E. coli gene presence/absence matrices (v0-v3 presets,
  linear/cosine KL annealing, gene-abundance + L1 losses)            -> train/
- latent sampling of synthetic genomes (default + focused modes)     -> sample/
- binary-mask -> gene-ID conversion with essential-gene backfill     -> genome/
- reference-guided sequence minimization to FASTA (byte-equal to the
  reference on the deterministic convert->minimize sub-pipeline)     -> genome/
- data exploration figures + essential-gene position extraction      -> explore/
- F1/accuracy evaluation + latent-space PCA visualisation            -> eval/

Unlike the reference (single-process PyTorch, per-batch host syncs), all
compute here is jitted and fused for TPU: whole epochs run as a single
compiled program (lax.scan over batches, one host sync per epoch), sampling is
an embarrassingly parallel pjit'd decode, and training scales data-parallel
over a `jax.sharding.Mesh` with XLA-inserted psum gradient reductions.
"""

__version__ = "0.1.0"

# Lazy public API — attribute access imports the submodule on first use so
# `import genome_minimizer_2_tpu` stays light.
_API = {
    "ExperimentConfig": "utils.config",
    "get_preset_config": "utils.config",
    "load_and_validate_data": "data.dataset",
    "load_matrix": "data.dataset",
    "load_gene_vocab": "data.dataset",
    "three_way_split": "data.split",
    "VAETrainer": "train.trainer",
    "create_trainer": "train.trainer",
    "Sampler": "sample.sampler",
    "load_sampler": "sample.sampler",
    "count_essential_genes": "sample.sampler",
    "MinimizerEngine": "genome.minimizer",
    "GenomeMinimiser": "genome.minimizer",
    "parse_genbank": "genome.genbank",
    "masks_to_gene_lists": "genome.converter",
    "check_essential_genes": "genome.converter",
    "convert_samples_streaming": "genome.converter",
    "save_packed_npz": "genome.converter",
    "sample_and_minimize": "pipeline",
    "IntegratedExperimentRunner": "experiments",
}


def __getattr__(name):
    if name in _API:
        import importlib

        module = importlib.import_module(f".{_API[name]}", __name__)
        return getattr(module, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_API))
