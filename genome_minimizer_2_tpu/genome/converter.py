"""Binary mask -> gene-ID conversion with essential-gene backfill.

Vectorized re-design of the reference converter
(/root/reference/src/genome_minimizer_2/explore_data/binary_converter.py):
same observable behavior — identical output .npy files — without the
per-row Python loops and per-10-rows progress prints:

- duplicate gene columns are dropped keeping the first occurrence
  (binary_converter.py:29-36),
- masks threshold at >= 0.5 (binary_converter.py:55 — note sampling mode
  uses strict > 0.5; the asymmetry is preserved, see sample/sampler.py),
- per-sample gene lists are the retained column names in column order
  (binary_converter.py:62-67), saved as an object-dtype .npy,
- ``check_essential_genes`` set-unions missing essentials into each sample
  and saves the *sorted* union to ``*_with_essentials.npy``
  (binary_converter.py:78-121).
"""

from __future__ import annotations

import logging
import os
from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def load_essential_set(essentials_csv_path: str) -> set:
    """Load the essential-gene set from its CSV.

    Accepts either a '# gene' or 'gene' header column.
    """
    essential_genes = pd.read_csv(essentials_csv_path)
    col = "# gene" if "# gene" in essential_genes.columns else "gene"
    return set(essential_genes[col].astype(str).str.strip())


def load_files(essentials_csv_path: str, ids_npy_path: str):
    """Load the essentials set and gene-list array (binary_converter.py:11-17)."""
    essential_set = load_essential_set(essentials_csv_path)
    id_lists = np.load(ids_npy_path, allow_pickle=True)
    return essential_set, id_lists


def dedupe_columns(cols: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Drop duplicate gene names keeping first occurrences.

    Returns (deduped_cols, keep_mask). (binary_converter.py:29-36)
    """
    cols = np.asarray(cols)
    uniq, first_idx = np.unique(cols, return_index=True)
    if len(uniq) == len(cols):
        return cols, np.ones(len(cols), dtype=bool)
    logger.warning(
        "%d duplicate gene names detected; keeping first occurrences",
        len(cols) - len(uniq),
    )
    keep_mask = np.zeros(len(cols), dtype=bool)
    keep_mask[np.sort(first_idx)] = True
    return cols[keep_mask], keep_mask


def load_masks(masks_npy_path: str) -> np.ndarray:
    """Load a masks .npy with the reference's shape coercions
    (binary_converter.py:39-45)."""
    masks = np.load(masks_npy_path, allow_pickle=True)
    if masks.ndim == 1:
        if len(masks) and isinstance(masks[0], (list, np.ndarray)):
            masks = np.stack([np.asarray(row, dtype=float) for row in masks])
        else:
            masks = masks[None, :]
    return masks


def _gene_lists_for_chunk(rows: np.ndarray, cols: np.ndarray,
                          keep_mask: np.ndarray, threshold: float
                          ) -> Tuple[List[List[str]], np.ndarray]:
    """Threshold a (n, P) chunk and gather per-row gene-name lists.

    Accepts rows at either the original (pre-dedupe) width or the deduped
    width; returns (lists, per-row gene counts)."""
    rows = np.asarray(rows, dtype=float)
    P = len(cols)
    if rows.shape[1] != keep_mask.size and rows.shape[1] != P:
        raise ValueError(
            f"Mask rows have length {rows.shape[1]}, but dataset has "
            f"{keep_mask.size} gene columns."
        )
    if rows.shape[1] == keep_mask.size and keep_mask.size != P:
        rows = rows[:, keep_mask]
    M = rows >= threshold
    return [cols[M[i]].tolist() for i in range(len(M))], M.sum(axis=1)


def masks_to_gene_lists(
    masks_npy_path: str,
    cols: Sequence[str],
    out_ids_npy: str | None,
    threshold: float = 0.5,
    chunk_size: int = 0,
) -> List[List[str]]:
    """Convert binary/continuous masks to per-sample gene-name lists.

    Vectorized: one >= threshold comparison over the whole (N, P) matrix,
    then a column-name gather per row. Output identical to
    binary_converter.py:19-76 (same dedupe, same >=, same object .npy).

    ``chunk_size > 0`` streams the masks file in row chunks through a
    memory map instead of materializing the full float matrix — at
    100k-genome scale a dense float64 masks file is ~44 GB, far beyond
    host RAM, while the gene lists themselves are ~100x smaller. Output
    is identical. Object-dtype (pickled) .npy files cannot be memory-
    mapped — the pickle must be deserialized whole — but their row->dense
    conversion IS chunked, so the additional dense float64 copy (which
    would double peak RSS) is bounded at chunk_size rows.
    """
    # object dtype so every row's list shares the SAME str objects (a
    # unicode array's .tolist() would allocate fresh strings per row —
    # ~gene_count x n_samples string objects). The reference gets this for
    # free from the pandas Index (binary_converter.py:62-67).
    cols = np.asarray(cols, dtype=object)
    logger.info("masks: %s", masks_npy_path)
    logger.info("Resolved %d gene columns", len(cols))

    cols, keep_mask = dedupe_columns(cols)

    mm = None
    if chunk_size and chunk_size > 0:
        try:
            mm = np.load(masks_npy_path, mmap_mode="r")
            if mm.ndim == 1:
                mm = None  # 1-D needs the coercions in load_masks
        except ValueError:  # object/pickled array — not mappable
            logger.info("masks file is not memory-mappable; loading whole")
            mm = None

    id_lists: List[List[str]] = []
    size_sum = 0
    if mm is not None:
        N = len(mm)
        logger.info("Masks shape: N=%d samples (streaming, chunk=%d)",
                    N, chunk_size)
        for lo in range(0, N, chunk_size):
            lists, sizes = _gene_lists_for_chunk(
                mm[lo: lo + chunk_size], cols, keep_mask, threshold)
            id_lists.extend(lists)
            size_sum += int(sizes.sum())
    else:
        masks = np.load(masks_npy_path, allow_pickle=True)
        is_rowwise_object = (masks.ndim == 1 and len(masks)
                             and isinstance(masks[0], (list, np.ndarray)))
        N = len(masks) if is_rowwise_object or masks.ndim > 1 else 1
        step = chunk_size if (chunk_size and is_rowwise_object) else N
        logger.info("Masks shape: N=%d samples%s", N,
                    f" (object rows, chunk={step})" if is_rowwise_object else "")
        if is_rowwise_object:
            # chunk the dense conversion: never stack all rows at once
            for lo in range(0, N, step):
                dense = np.stack([np.asarray(r, dtype=float)
                                  for r in masks[lo: lo + step]])
                lists, sizes = _gene_lists_for_chunk(dense, cols, keep_mask,
                                                     threshold)
                id_lists.extend(lists)
                size_sum += int(sizes.sum())
        else:
            if masks.ndim == 1:
                masks = masks[None, :]
            id_lists, sizes = _gene_lists_for_chunk(masks, cols, keep_mask,
                                                    threshold)
            size_sum = int(sizes.sum())

    if out_ids_npy:
        os.makedirs(os.path.dirname(out_ids_npy) or ".", exist_ok=True)
        np.save(out_ids_npy, np.array(id_lists, dtype=object))
        logger.info("Saved IDs (NPY): %s", out_ids_npy)

    print(f"✓ Number of samples processed = {N} | Average gene count = {size_sum / max(N, 1):.1f}")
    return id_lists


def check_essential_genes(
    essential_set: set,
    id_lists,
    out_ids_npy: str,
) -> str:
    """Force-insert missing essential genes per sample; save sorted unions.

    Semantics identical to binary_converter.py:78-121: per-sample set union
    with the essentials, sorted() (lexicographic by code point), object .npy
    saved next to ``out_ids_npy`` with the ``_with_essentials`` suffix.
    """
    n_samples = len(id_lists)
    logger.info(
        "Checking & fixing essential genes (n=%d) across %d samples",
        len(essential_set), n_samples,
    )
    updated_samples = []
    n_fixed = 0
    n_ok = 0
    for idx, gene_list in enumerate(id_lists):
        if isinstance(gene_list, np.ndarray):
            gene_list = gene_list.tolist()
        gene_set = set(gene_list)
        missing = essential_set - gene_set
        if missing:
            gene_set.update(missing)
            if essential_set - gene_set:
                raise RuntimeError(
                    f"Post-add verify failed for sample {idx + 1}"
                )
            n_fixed += 1
        else:
            n_ok += 1
        updated_samples.append(sorted(gene_set))

    base, ext = os.path.splitext(out_ids_npy)
    out_path = base + "_with_essentials" + ext
    np.save(out_path, np.array(updated_samples, dtype=object))
    logger.info("Saved updated samples with essential genes to: %s", out_path)
    print(f"✓ Verified {n_samples} samples | already OK: {n_ok} | fixed: {n_fixed}")
    return out_path
