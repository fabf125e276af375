"""Helpers for using the mounted reference implementation as a test oracle.

We import the reference's torch modules (read-only) purely to check numerical
parity of our JAX re-implementation. Guarded: tests skip if the reference or
torch is unavailable.
"""

import sys

REFERENCE_ROOT = "/root/reference"


def import_reference_module(dotted: str):
    if REFERENCE_ROOT not in sys.path:
        # APPEND, never prepend: the reference tree has its own top-level
        # main.py which would otherwise shadow the repo's `main` module for
        # tests that run later in the same process
        sys.path.append(REFERENCE_ROOT)
    import importlib

    return importlib.import_module(dotted)
