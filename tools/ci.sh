#!/bin/bash
# Full local verification: python suite (virtual 8-device CPU mesh), native
# tests (plain + ThreadSanitizer), multi-chip dryrun. TPU-hardware checks
# (tools/tpu_smoke.py, bench.py) are separate — they need the chip.
set -e
cd "$(dirname "$0")/.."

python -m pytest tests/ -q
make -C native check
python __graft_entry__.py
echo "CI PASS"
