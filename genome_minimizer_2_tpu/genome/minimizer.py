"""Reference-guided genome minimization — vectorized sequence engine.

Re-design of the reference minimizer (/root/reference/src/genome_minimizer_2/
minimizer/minimizer_2.py). The reference builds, per sample, a Python *set of
every base position* to remove and then loops base-by-base over the 4.6 Mbp
genome (minimizer_2.py:68-101) — O(genome) Python-object work per genome.
Here the same result is computed with interval arithmetic on numpy arrays:

1. parse the GenBank once into (name, start, end) arrays (genome/genbank.py),
2. per sample, mark non-essential features (name not in the needed-gene set —
   same membership semantics as the reference's list scan, minimizer_2.py:62),
3. build the union of their [start, end) intervals with a +1/-1 boundary
   diff + cumsum (exact set-union equivalence),
4. compact the sequence bytes with one boolean gather.

Output is byte-identical to the reference: same FASTA headers
('>Minimized_E_coli_K12_MG1655_{i+1}'), same single-file '#' comment lines,
same per-file naming template, same returned statistics (including the
reference's quirk that the single-file average-reduction accumulator only
samples printed iterations — minimizer_2.py:482-489).

Scale-out: ``process_sharded`` partitions the sample axis across hosts
(jax.process_index) and merges per-host shard files in process order.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np

from .genbank import GenBankRecord, parse_genbank

logger = logging.getLogger(__name__)

SEQ_ID_PREFIX = "Minimized_E_coli_K12_MG1655"


@dataclasses.dataclass
class MinimizerEngine:
    """Preprocessed wild-type genome ready for batch minimization."""

    record: GenBankRecord
    gene_names: np.ndarray   # (F,) object
    starts: np.ndarray       # (F,) int64, 0-based inclusive
    ends: np.ndarray         # (F,) int64, 0-based exclusive
    seq_bytes: np.ndarray    # (L,) uint8

    @classmethod
    def from_genbank(cls, path: str | Path) -> "MinimizerEngine":
        record = parse_genbank(path)
        return cls.from_record(record)

    @classmethod
    def from_record(cls, record: GenBankRecord) -> "MinimizerEngine":
        names, starts, ends = record.gene_arrays()
        seq_bytes = np.frombuffer(record.seq.encode("ascii"), dtype=np.uint8)
        return cls(record=record, gene_names=names, starts=starts, ends=ends,
                   seq_bytes=seq_bytes)

    @property
    def original_length(self) -> int:
        return len(self.seq_bytes)

    # -- core ---------------------------------------------------------------

    def removal_mask(self, needed_genes: Sequence[str]) -> np.ndarray:
        """(L,) bool — True where the base belongs to a non-essential gene.

        Equivalent to the reference's positions_to_remove set
        (minimizer_2.py:68-83): union of [start, end) over features whose
        gene name is NOT in ``needed_genes``.
        """
        needed = set(needed_genes)
        non_essential = np.fromiter(
            (name not in needed for name in self.gene_names),
            dtype=bool, count=len(self.gene_names),
        )
        L = self.original_length
        diff = np.zeros(L + 1, dtype=np.int32)
        s = np.minimum(self.starts[non_essential], L)
        e = np.minimum(self.ends[non_essential], L)
        np.add.at(diff, s, 1)
        np.add.at(diff, e, -1)
        return np.cumsum(diff[:-1]) > 0

    def num_removed_features(self, needed_genes: Sequence[str]) -> int:
        needed = set(needed_genes)
        return int(sum(name not in needed for name in self.gene_names))

    def minimize(self, needed_genes: Sequence[str]) -> str:
        """Minimized genome string for one sample (byte-equal to the
        reference's per-base loop, minimizer_2.py:85-101)."""
        keep = ~self.removal_mask(needed_genes)
        return self.seq_bytes[keep].tobytes().decode("ascii")

    def drop_masks(self, gene_lists: Sequence[Sequence[str]]) -> np.ndarray:
        """(n_samples, F) uint8 — 1 where the feature's gene is NOT needed.

        Vectorized name matching: feature names are factorized once; each
        sample then does O(|needed|) dictionary lookups instead of O(F) set
        probes.
        """
        uniq_names, feat_uid = np.unique(self.gene_names.astype(str),
                                         return_inverse=True)
        name_to_uid = {n: i for i, n in enumerate(uniq_names)}
        n = len(gene_lists)
        drop = np.empty((n, len(self.gene_names)), np.uint8)
        for i, needed in enumerate(gene_lists):
            present = np.zeros(len(uniq_names), bool)
            for g in needed:
                uid = name_to_uid.get(str(g))
                if uid is not None:
                    present[uid] = True
            drop[i] = ~present[feat_uid]
        return drop

    def minimize_batch(
        self, gene_lists: Sequence[Sequence[str]], use_native: bool | None = None
    ) -> List[str]:
        """Batch minimization; uses the native C++ core (multithreaded
        interval fill + compaction) when available, numpy otherwise. Results
        are byte-identical either way (tested)."""
        from . import native

        if use_native is None:
            use_native = native.available() and len(gene_lists) > 1
        if use_native:
            seqs = native.minimize_batch(self.seq_bytes, self.starts, self.ends,
                                         self.drop_masks(gene_lists))
            return [s.decode("ascii") for s in seqs]
        return [self.minimize(genes) for genes in gene_lists]

    def feature_lookup(self, cols: Sequence[str], essential_set) -> tuple[np.ndarray, np.ndarray]:
        """Precompute, per feature: the dataset-column index of its gene name
        (-1 if the name is not a column) and whether the name is essential.

        Enables fully vectorized drop-mask computation straight from binary
        masks: feature f is kept iff mask[col_idx[f]] or essential[f] —
        exactly 'gene_name in (present columns ∪ essentials)'.
        """
        col_pos = {str(c): i for i, c in enumerate(cols)}
        col_idx = np.array([col_pos.get(str(n), -1) for n in self.gene_names],
                           np.int64)
        ess = np.array([str(n) in essential_set for n in self.gene_names], bool)
        return col_idx, ess

    def feature_lookup_packed(
        self, cols: Sequence[str], keep_mask: np.ndarray, essential_set
    ) -> tuple[np.ndarray, np.ndarray]:
        """feature_lookup in ORIGINAL (pre-dedupe) column space, for packed
        presence bitmasks straight off the sampler: ``cols`` are the deduped
        names, ``keep_mask`` the dedupe keep-flags over the original columns.
        Duplicate names resolve to their first-occurrence column — the same
        value the staged dedupe path reads."""
        col_idx, ess = self.feature_lookup(cols, essential_set)
        orig_pos = np.nonzero(np.asarray(keep_mask))[0].astype(np.int64)
        col_idx = np.where(col_idx >= 0, orig_pos[np.maximum(col_idx, 0)], -1)
        return col_idx, ess

    def minimize_packed_to_fasta(
        self,
        packed: np.ndarray,
        col_idx: np.ndarray,
        ess: np.ndarray,
        path: str,
        start_index: int = 0,
        append: bool = False,
        use_native: bool | None = None,
        n_threads: int = 0,
        write_base: int | None = None,
    ) -> np.ndarray:
        """FASTA directly from PACKED presence bitmasks (uint8, little bit
        order over the original dataset columns — the sampler's on-device
        format). The converter decision (keep feature iff its gene's bit is
        set or it is essential) runs inside the native minimize workers, so
        the host never materializes unpacked masks or dense drop matrices
        (8x smaller stream than the staged path; byte-identical output —
        tested in test_pipeline.py / native/test_gm2min.cpp)."""
        from . import native

        packed = np.ascontiguousarray(packed, np.uint8)
        if use_native is None:
            use_native = native.available() and packed.shape[0] > 1
        if use_native:
            return native.minimize_packed_to_fasta(
                self.seq_bytes, self.starts, self.ends, packed,
                col_idx, ess, path, SEQ_ID_PREFIX,
                start_index=start_index, append=append, n_threads=n_threads,
                write_base=write_base)
        # fallback: identical semantics via the staged unpack -> drop path
        bits = np.unpackbits(packed, axis=1, bitorder="little")
        padded = np.concatenate(
            [bits.astype(bool),
             np.zeros((bits.shape[0], 1), bool)], axis=1)
        present = padded[:, col_idx]  # col_idx == -1 -> the padded False col
        drop = (~(present | np.asarray(ess, bool)[None, :])).astype(np.uint8)
        return self.minimize_drop_to_fasta(drop, path, start_index=start_index,
                                           append=append, use_native=False,
                                           write_base=write_base)

    @staticmethod
    def record_bytes(lens: np.ndarray, start_index: int = 0) -> int:
        """Exact byte size of the FASTA records a ``minimize_*_to_fasta``
        batch writes: '>' + prefix + '_' + str(idx+1) + '\\n' + seq + '\\n'
        per record (native/gm2min.cpp minimize_to_fasta_impl's offset
        arithmetic, and the Python fallback's). Single source of truth for
        stream-offset bookkeeping — the pipeline advances its write offset
        with this and asserts it against the actual file size after every
        chunk, so any drift between this arithmetic and the writers is a
        loud error, not silent mid-file corruption."""
        lens = np.asarray(lens)
        ids = sum(len(str(start_index + j + 1)) for j in range(lens.size))
        return int(lens.sum()) + lens.size * (len(SEQ_ID_PREFIX) + 4) + ids

    def drop_masks_from_binary(
        self, binary: np.ndarray, col_idx: np.ndarray, ess: np.ndarray
    ) -> np.ndarray:
        """(n, F) uint8 drop masks from (n, n_cols) binary presence masks
        using a feature_lookup — no per-sample Python work."""
        binary = np.asarray(binary, bool)
        padded = np.concatenate(
            [binary, np.zeros((binary.shape[0], 1), bool)], axis=1)
        present = padded[:, col_idx]  # col_idx == -1 -> the padded False col
        keep = present | ess[None, :]
        return (~keep).astype(np.uint8)

    def minimize_batch_to_fasta(
        self,
        gene_lists: Sequence[Sequence[str]],
        path: str,
        start_index: int = 0,
        append: bool = False,
        use_native: bool | None = None,
    ) -> np.ndarray:
        """Batch minimize + write FASTA records ('>{prefix}_{i+1}\\n{seq}\\n')
        directly; returns minimized lengths. Native fast path streams from
        C++; fallback writes from Python with identical bytes."""
        from . import native

        if use_native is None:
            use_native = native.available() and len(gene_lists) > 1
        return self.minimize_drop_to_fasta(
            self.drop_masks(gene_lists), path, start_index=start_index,
            append=append, use_native=use_native)

    def minimize_drop_to_fasta(
        self,
        drop: np.ndarray,
        path: str,
        start_index: int = 0,
        append: bool = False,
        use_native: bool | None = None,
        n_threads: int = 0,
        write_base: int | None = None,
    ) -> np.ndarray:
        """FASTA from precomputed (n, F) drop masks (the vectorized pipeline
        path — see drop_masks_from_binary); returns minimized lengths.

        ``write_base``: write the batch at this exact byte offset instead of
        append/fresh semantics (native._write_base) — the streaming
        pipeline's in-place rewrite path; the caller truncates the file to
        the stream's final size at the end."""
        from . import native

        drop = np.ascontiguousarray(drop, np.uint8)
        if use_native is None:
            use_native = native.available() and drop.shape[0] > 1
        if use_native:
            return native.minimize_to_fasta(
                self.seq_bytes, self.starts, self.ends, drop, path,
                SEQ_ID_PREFIX, start_index=start_index, append=append,
                n_threads=n_threads, write_base=write_base)
        L = self.original_length
        lens = np.zeros(drop.shape[0], np.int64)
        if write_base is not None:
            if not os.path.exists(path):
                open(path, "wb").close()
            out_cm = open(path, "r+b")
            out_cm.seek(int(write_base))
        else:
            out_cm = open(path, "ab" if append else "wb")
        with out_cm as out:
            for i in range(drop.shape[0]):
                diff = np.zeros(L + 1, np.int32)
                sel = drop[i].astype(bool)
                np.add.at(diff, np.minimum(self.starts[sel], L), 1)
                np.add.at(diff, np.minimum(self.ends[sel], L), -1)
                keep = ~(np.cumsum(diff[:-1]) > 0)
                seq = self.seq_bytes[keep].tobytes()
                lens[i] = len(seq)
                out.write(f">{SEQ_ID_PREFIX}_{start_index + i + 1}\n".encode())
                out.write(seq)
                out.write(b"\n")
        return lens


class GenomeMinimiser:
    """Per-sample facade with the reference's attribute surface
    (minimizer_2.py:19-270): wildtype_sequence, original_genome_length,
    needed_genes, positions_to_remove, reduced_genome_str,
    get_reduction_stats(), save_minimized_genome()."""

    def __init__(
        self,
        record_path: str | None = None,
        needed_genes_path: str | None = None,
        idx: int = 0,
        model_name: str = "",
        record: GenBankRecord | None = None,
        engine: MinimizerEngine | None = None,
        all_needed_gene_lists: list | None = None,
        needed_genes_list: list | None = None,
    ):
        self.idx = idx
        self.model_name = model_name
        if engine is not None:
            self.engine = engine
        elif record is not None:
            self.engine = MinimizerEngine.from_record(record)
        else:
            self.engine = MinimizerEngine.from_genbank(record_path)
        self.record = self.engine.record
        self.wildtype_sequence = self.record
        self.original_genome_length = self.engine.original_length

        if needed_genes_list is not None:
            self.needed_genes = list(needed_genes_list)
        elif all_needed_gene_lists is not None:
            self.needed_genes = list(all_needed_gene_lists[idx])
        else:
            lists = np.load(needed_genes_path, allow_pickle=True).tolist()
            self.needed_genes = list(lists[idx])

        self._removal = self.engine.removal_mask(self.needed_genes)
        self.positions_to_remove = None  # lazily materialized set view
        self.reduced_genome_str = self.engine.seq_bytes[~self._removal].tobytes().decode("ascii")

    def get_positions_to_remove(self) -> set:
        if self.positions_to_remove is None:
            self.positions_to_remove = set(np.nonzero(self._removal)[0].tolist())
        return self.positions_to_remove

    def get_reduction_stats(self) -> dict:
        """Reduction statistics (minimizer_2.py:254-270)."""
        reduced_length = len(self.reduced_genome_str)
        return {
            "original_length": self.original_genome_length,
            "reduced_length": reduced_length,
            "reduction_percentage": (
                (self.original_genome_length - reduced_length)
                / self.original_genome_length * 100
            ),
            "genes_removed": self.engine.num_removed_features(self.needed_genes),
            "positions_removed": int(self._removal.sum()),
        }

    def save_minimized_genome(self, file_path: str):
        """Write '>{prefix}_{idx+1}\\n{seq}' (minimizer_2.py:103-121 — note the
        reference writes no trailing newline in this single-genome method)."""
        with open(file_path, "w") as f:
            f.write(f">{SEQ_ID_PREFIX}_{self.idx + 1}\n")
            f.write(self.reduced_genome_str)


def plot_minimized_distribution(minimised_sizes_mbp, model_name: str,
                                output_dir: str):
    """Histogram of minimized genome sizes (minimizer_2.py:212-252); skipped
    below 100 data points like the reference."""
    if len(minimised_sizes_mbp) < 100:
        print(f"Not enough data points ({len(minimised_sizes_mbp)}) to create "
              "meaningful plot. Need at least 100.")
        return None
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sizes = np.asarray(minimised_sizes_mbp)
    median = float(np.median(sizes))
    plt.figure(figsize=(4, 4))
    plt.hist(sizes, bins=10, color="dodgerblue")
    plt.xlabel("Genome size (Mbp)")
    plt.ylabel("Frequency")
    plt.title("Distribution of Minimized Genome Sizes")
    plt.axvline(median, color="b", linestyle="dashed", linewidth=2)
    handles = [
        plt.Line2D([], [], color="b", linestyle="dashed", linewidth=2,
                   label=f"Median: {median:.2f}"),
        plt.Line2D([], [], color="black", linewidth=2,
                   label=f"Min: {sizes.min():.2f}"),
        plt.Line2D([], [], color="black", linewidth=2,
                   label=f"Max: {sizes.max():.2f}"),
    ]
    plt.legend(handles=handles)
    os.makedirs(output_dir, exist_ok=True)
    out = os.path.join(output_dir,
                       f"minimised_genomes_distribution_{model_name}.pdf")
    plt.savefig(out, format="pdf", bbox_inches="tight")
    plt.close()
    return out


# ---------------------------------------------------------------------------
# Duplicate analysis + summary (minimizer_2.py:273-444)
# ---------------------------------------------------------------------------

def check_sequence_duplicates(sequences_dict: Dict[str, str]) -> dict:
    """Group identical sequences; same stats dict as minimizer_2.py:273-303."""
    groups: Dict[str, list] = {}
    for seq_id, sequence in sequences_dict.items():
        groups.setdefault(sequence, []).append(seq_id)
    duplicates = {s: ids for s, ids in groups.items() if len(ids) > 1}
    uniques = {s: ids for s, ids in groups.items() if len(ids) == 1}
    return {
        "total_sequences": len(sequences_dict),
        "unique_sequences": len(groups),
        "duplicate_groups": len(duplicates),
        "duplicated_sequences": sum(len(ids) for ids in duplicates.values()),
        "unique_only_sequences": len(uniques),
        "duplicates_detail": duplicates,
        "compression_ratio": len(groups) / len(sequences_dict) if sequences_dict else 0,
    }


def print_duplicate_statistics(duplicate_stats: dict):
    print("\n" + "=" * 80)
    print("SEQUENCE DUPLICATION ANALYSIS")
    print("=" * 80)
    print(" Overview:")
    print(f"- Total sequences generated: {duplicate_stats['total_sequences']:,}")
    print(f"- Unique sequences: {duplicate_stats['unique_sequences']:,}")
    print(f"- Duplicate groups: {duplicate_stats['duplicate_groups']:,}")
    print(f"- Sequences with duplicates: {duplicate_stats['duplicated_sequences']:,}")
    print(f"- Truly unique sequences: {duplicate_stats['unique_only_sequences']:,}")
    print(f"- Percentage of unique sequences: {duplicate_stats['compression_ratio']:.2%}")
    if duplicate_stats["duplicate_groups"] > 0:
        dups = sorted(duplicate_stats["duplicates_detail"].items(),
                      key=lambda x: len(x[1]), reverse=True)
        print("\n Duplicate Details:")
        for i, (sequence, ids) in enumerate(dups[:10]):
            print(f"Group {i + 1}: {len(ids)} identical sequences")
            print(f"- Sequence: {sequence[:50]}{'...' if len(sequence) > 50 else ''}")
            print(f"- IDs: {', '.join(ids[:5])}{'...' if len(ids) > 5 else ''}")
            print()
        if len(dups) > 10:
            print(f"  ... and {len(dups) - 10} more duplicate groups")
    else:
        print("\n✓ No duplicate sequences found!")
    print("=" * 80)


def generate_summary_file(
    output_file: str,
    model_name: str,
    genome_path: str,
    genes_path: str,
    original_length: int,
    minimised_sizes: list,
    duplicate_stats: dict,
    output_dir: str | None = None,
):
    """Summary report (minimizer_2.py:346-444); output_dir defaults next to
    ``output_file`` rather than a hard-coded project subdir."""
    output_dir = output_dir or (os.path.dirname(output_file) or ".")
    os.makedirs(output_dir, exist_ok=True)
    summary_file = os.path.join(
        output_dir, os.path.basename(output_file).replace(".fasta", "_summary.txt"))

    sizes = np.asarray(minimised_sizes, dtype=float)
    mean_size = sizes.mean() if sizes.size else 0
    median_size = float(np.median(sizes)) if sizes.size else 0
    min_size = sizes.min() if sizes.size else 0
    max_size = sizes.max() if sizes.size else 0
    std_size = sizes.std() if sizes.size else 0

    with open(summary_file, "w") as f:
        f.write("=" * 80 + "\n")
        f.write("GENOME MINIMIZATION SUMMARY REPORT\n")
        f.write("=" * 80 + "\n\n")
        f.write("GENERATION INFORMATION\n")
        f.write("-" * 40 + "\n")
        f.write(f"Model Name: {model_name}\n")
        f.write(f"Generated on: {np.datetime64('now')}\n")
        f.write(f"Output FASTA file: {os.path.basename(output_file)}\n")
        f.write(f"Summary file: {os.path.basename(summary_file)}\n\n")
        f.write("INPUT FILES\n")
        f.write("-" * 40 + "\n")
        f.write(f"Genome template: {os.path.basename(genome_path)}\n")
        f.write(f"Gene lists file: {os.path.basename(genes_path)}\n")
        f.write(f"Original genome length: {original_length:,} bp\n\n")
        f.write("PROCESSING STATISTICS\n")
        f.write("-" * 40 + "\n")
        f.write(f"Successfully processed: {len(minimised_sizes):,}\n\n")
        f.write("MINIMIZED GENOME SIZE STATISTICS\n")
        f.write("-" * 40 + "\n")
        f.write(f"Mean size: {mean_size:.3f} Mbp ({mean_size * 1e6:,.0f} bp)\n")
        f.write(f"Median size: {median_size:.3f} Mbp ({median_size * 1e6:,.0f} bp)\n")
        f.write(f"Minimum size: {min_size:.3f} Mbp ({min_size * 1e6:,.0f} bp)\n")
        f.write(f"Maximum size: {max_size:.3f} Mbp ({max_size * 1e6:,.0f} bp)\n")
        f.write(f"Standard deviation: {std_size:.3f} Mbp\n")
        f.write(f"Size range: {max_size - min_size:.3f} Mbp\n\n")
        if original_length > 0:
            f.write("GENOME REDUCTION STATISTICS\n")
            f.write("-" * 40 + "\n")
            f.write(f"Mean reduction: {((original_length - mean_size * 1e6) / original_length) * 100:.2f}%\n")
            f.write(f"Minimum reduction: {((original_length - max_size * 1e6) / original_length) * 100:.2f}% (largest genome)\n")
            f.write(f"Maximum reduction: {((original_length - min_size * 1e6) / original_length) * 100:.2f}% (smallest genome)\n\n")
        f.write("SEQUENCE DUPLICATION ANALYSIS\n")
        f.write("-" * 40 + "\n")
        f.write(f"Total sequences: {duplicate_stats['total_sequences']:,}\n")
        f.write(f"Unique sequences: {duplicate_stats['unique_sequences']:,}\n")
        f.write(f"Duplicate groups: {duplicate_stats['duplicate_groups']:,}\n")
        f.write(f"Sequences with duplicates: {duplicate_stats['duplicated_sequences']:,}\n")
        f.write(f"Uniqueness ratio: {duplicate_stats['compression_ratio']:.2%}\n")
        if minimised_sizes:
            f.write("\nSIZE DISTRIBUTION SUMMARY\n")
            f.write("-" * 40 + "\n")
            size_bins = np.linspace(min_size, max_size, 6)
            hist, _ = np.histogram(sizes, bins=size_bins)
            for i in range(len(hist)):
                pct = (hist[i] / len(minimised_sizes)) * 100
                f.write(f"{size_bins[i]:.2f} - {size_bins[i + 1]:.2f} Mbp: "
                        f"{hist[i]:,} genomes ({pct:.1f}%)\n")
    logger.info("✓ Summary file saved: %s", summary_file)
    return summary_file


# ---------------------------------------------------------------------------
# Batch drivers (minimizer_2.py:447-560)
# ---------------------------------------------------------------------------

def _load_inputs(genome_path: str, genes_path: str):
    engine = MinimizerEngine.from_genbank(genome_path)
    all_lists = np.load(genes_path, allow_pickle=True).tolist()
    return engine, all_lists


def process_multiple_genomes_single_file(
    genome_path: str,
    genes_path: str,
    model_name: str,
    output_file: str | None = None,
    verbose: bool = True,
) -> dict:
    """Minimize every gene list into ONE FASTA — byte-identical layout to
    minimizer_2.py:447-495 ('#' comment header lines + '>{id}\\n{seq}\\n')."""
    if not output_file:
        output_file = os.path.join("minimized_genomes",
                                   f"minimized_genomes_{model_name}.fasta")
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)

    engine, all_lists = _load_inputs(genome_path, genes_path)
    original_length = engine.original_length
    genome_number = len(all_lists)

    tot_red_pct = 0.0
    total_length_bp = 0

    if verbose:
        for idx, needed in enumerate(all_lists):
            print(f"[{idx + 1}/{genome_number}] genes present: {len(needed)}")
    with open(output_file, "w") as out:
        out.write(f"# Minimized genomes generated using model: {model_name}\n")
        out.write(f"# Total genomes: {genome_number}\n")
        out.write(f"# Generated on: {np.datetime64('now')}\n")
    lens = engine.minimize_batch_to_fasta(all_lists, output_file, append=True)
    sizes_mbp = [int(l) / 1e6 for l in lens]
    for idx, genome_length in enumerate(lens):
        if idx <= 9 or (idx + 1) % 100 == 0:
            # reference quirk: the running averages only sample printed
            # iterations (minimizer_2.py:482-486) — preserved
            red_pct = (original_length - int(genome_length)) / original_length * 100.0
            if verbose:
                print(f"  → {int(genome_length):,} bp ({red_pct:.1f}% reduction)")
            tot_red_pct += red_pct
            total_length_bp += int(genome_length)

    return {
        "genome_count": genome_number,
        "average_reduction_pct": tot_red_pct / genome_number,
        "average_length_bp": total_length_bp / genome_number,
        "sizes_mbp": sizes_mbp,
        "original_length": original_length,
    }


def process_multiple_genomes_multiple_files(
    genome_path: str,
    genes_path: str,
    model_name: str,
    output_dir: str | None = None,
    filename_template: str = "minimized_{model}_{idx:04d}.fasta",
    verbose: bool = True,
) -> dict:
    """Minimize every gene list into per-sample FASTA files
    (minimizer_2.py:499-560)."""
    output_dir = output_dir or "minimized_genomes"
    os.makedirs(output_dir, exist_ok=True)

    engine, all_lists = _load_inputs(genome_path, genes_path)
    original_length = engine.original_length
    genome_number = len(all_lists)

    tot_red_pct = 0.0
    total_length = 0
    if verbose:
        print(f"Writing {genome_number} individual FASTA files to: {output_dir}")
    seqs = engine.minimize_batch(all_lists)
    for idx, (needed, seq) in enumerate(zip(all_lists, seqs)):
        if verbose:
            print(f"[{idx + 1}/{genome_number}] genes present: {len(needed)}")
        genome_length = len(seq)
        red_pct = (original_length - genome_length) / original_length * 100.0
        filename = filename_template.format(model=model_name, idx=idx)
        out_path = os.path.join(output_dir, filename)
        with open(out_path, "w") as fh:
            fh.write(f">{SEQ_ID_PREFIX}_{idx + 1}\n{seq}\n")
        tot_red_pct += red_pct
        total_length += genome_length
        if verbose and (idx <= 9 or (idx + 1) % 100 == 0):
            print(f"  → saved {os.path.basename(out_path)} | {genome_length:,} bp "
                  f"({red_pct:.1f}% reduction)")

    return {
        "genome_count": genome_number,
        "average_reduction_pct": tot_red_pct / genome_number,
        "average_length_bp": total_length / genome_number,
    }


# ---------------------------------------------------------------------------
# Multi-host sharding (new capability — SURVEY.md §2.3)
# ---------------------------------------------------------------------------

def process_sharded(
    genome_path: str,
    genes_path: str,
    model_name: str,
    output_file: str,
    process_index: int | None = None,
    process_count: int | None = None,
    merge: bool = True,
) -> str | None:
    """Pod-scale single-file minimization: each host minimizes a contiguous
    shard of the sample axis into ``output_file.shard{K}``; host 0 merges the
    shards in process order so the merged file is byte-identical to the
    single-host output.
    """
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count

    engine, all_lists = _load_inputs(genome_path, genes_path)
    n = len(all_lists)
    lo = pi * n // pc
    hi = (pi + 1) * n // pc

    from ..parallel import barrier

    shard_path = barrier.shard_file(output_file, pi)
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
    try:
        # retract this shard's stale sentinel (e.g. from a previous
        # merge=False run) before writing — a concurrent merger/consumer
        # must never read the shard mid-write as complete (pipeline.py has
        # the same invariant)
        os.remove(shard_path + ".done")
    except FileNotFoundError:
        pass
    engine.minimize_batch_to_fasta(all_lists[lo:hi], shard_path, start_index=lo)
    barrier.mark_shard_done(shard_path)

    if not merge or pi != 0:
        return None
    # host 0 merges after the sentinel barrier — every shard is fully written
    # and fsync'd before any shard is read (shards on shared fs)
    import shutil

    shard_paths = barrier.wait_for_shards(output_file, pc)
    with open(output_file, "wb") as out:
        out.write(f"# Minimized genomes generated using model: {model_name}\n"
                  f"# Total genomes: {n}\n"
                  f"# Generated on: {np.datetime64('now')}\n".encode())
        for sp in shard_paths:
            # streamed: shards are tens of GB at north-star scale
            with open(sp, "rb") as f:
                shutil.copyfileobj(f, out, length=16 << 20)
    barrier.clear_sentinels(output_file, pc)
    return output_file
