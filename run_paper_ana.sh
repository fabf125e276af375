#!/bin/bash
# Paper analysis driver (reference parity: /root/reference/run_paper_ana.sh):
# train v0/v1/v2 for 10 epochs each, then sample 1000 genomes from each.
set -e

ROOT="${GM2_ROOT:-$(dirname "$0")}"

for preset in v0 v1 v2; do
    python main.py --mode training --preset "$preset" --epochs 10
    python main.py --mode sample \
        --model-path "$ROOT/models/trained_models/${preset}_model/saved_VAE_${preset}.npz" \
        --num-samples 1000
done
