"""Visualization suite.

Capability parity with the reference's plotting surface
(/root/reference/src/genome_minimizer_2/training/evaluation/visualise.py and
utils/extras.py:20-163, 231-255): latent-space PCA by phylogroup, latent
dimension histograms, original-vs-reconstruction examples, the 2x2 training
summary panel, loss-vs-epoch curves, genome-size and essential-gene
distributions, essential-vs-total scatter, and F1/accuracy histograms.
All figures save as PDF with the reference's figure sizes/colors.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

try:
    import seaborn as sns
except ImportError:  # pragma: no cover
    sns = None

from .pca import pca_fit_transform


def _stat_legend(values, median_color="b"):
    median = np.median(values)
    handles = [
        plt.Line2D([], [], color=median_color, linestyle="dashed", linewidth=2,
                   label=f"Median: {median:.2f}"),
        plt.Line2D([], [], color="black", linewidth=2, label=f"Min: {np.min(values):.2f}"),
        plt.Line2D([], [], color="black", linewidth=2, label=f"Max: {np.max(values):.2f}"),
    ]
    return median, handles


def plot_loss_vs_epochs_graph(epochs, train_loss_vals, val_loss_vals, fig_name):
    """Train/val loss curves (extras.py:231-255)."""
    plt.figure(figsize=(4, 4), dpi=300)
    plt.scatter(epochs, train_loss_vals, color="dodgerblue")
    plt.plot(epochs, train_loss_vals, label="Train Loss", color="dodgerblue")
    plt.scatter(epochs, val_loss_vals, color="darkorange")
    plt.plot(epochs, val_loss_vals, label="Validation Loss", color="darkorange")
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.legend(fontsize=8)
    plt.savefig(fig_name, format="pdf", bbox_inches="tight")
    plt.close()


def plot_samples_distribution(binary_generated_samples, figure_name, plot_color,
                              x_min=0, x_max=0):
    """Genome-size histogram (extras.py:127-163)."""
    sizes = np.asarray(binary_generated_samples).sum(axis=1)
    median, handles = _stat_legend(sizes)
    plt.figure(figsize=(5, 5))
    plt.hist(sizes, color=plot_color)
    plt.xlim(x_min, x_max)
    plt.xlabel("Genome size")
    plt.ylabel("Frequency")
    plt.axvline(median, color="b", linestyle="dashed", linewidth=2)
    plt.legend(handles=handles, fontsize=6, loc="upper left")
    plt.savefig(figure_name, format="pdf", bbox_inches="tight")
    plt.close()


def plot_essential_genes_distribution(essential_counts, figure_name, plot_color,
                                      x_min=0, x_max=0):
    """Essential-genes histogram (extras.py:90-124)."""
    counts = np.asarray(essential_counts)
    median, handles = _stat_legend(counts)
    plt.figure(figsize=(5, 5))
    plt.hist(counts, color=plot_color, range=(x_min, x_max), bins=30)
    plt.xlim(x_min, x_max)
    plt.xlabel("Essential genes")
    plt.ylabel("Frequency")
    plt.axvline(median, color="b", linestyle="dashed", linewidth=2)
    plt.legend(handles=handles, fontsize=6)
    plt.savefig(figure_name, format="pdf", bbox_inches="tight")
    plt.close()


def plot_essential_vs_total(essential_counts, total_counts, output_path):
    """Essential vs genome size scatter + regression (extras.py:20-28)."""
    plt.figure(figsize=(4, 4))
    plt.scatter(total_counts, essential_counts, color="violet")
    if sns is not None:
        sns.regplot(x=np.asarray(total_counts), y=np.asarray(essential_counts),
                    scatter=False, color="black")
    plt.xlabel("Genome size")
    plt.ylabel("Essential genes")
    plt.savefig(output_path, format="pdf", bbox_inches="tight")
    plt.close()


def plot_latent_space_pca(latents, phylogroups, config, output_dir,
                          n_components: int = 3, show_plot: bool = True):
    """Latent PCA scatter by phylogroup (visualise.py:20-81).

    Takes precomputed latents (Sampler.encode_means) instead of a model +
    loader. Returns a DataFrame with PC columns + phylogroup.
    """
    import pandas as pd

    os.makedirs(output_dir, exist_ok=True)
    data_pca, ratio = pca_fit_transform(latents, n_components)
    df_pca = pd.DataFrame(data_pca, columns=[f"PC{i + 1}" for i in range(n_components)])
    df_pca["phylogroup"] = np.asarray(phylogroups)
    if show_plot:
        fig, ax = plt.subplots(figsize=(5, 5))
        if sns is not None:
            sns.scatterplot(x="PC1", y="PC2", hue=df_pca["phylogroup"],
                            data=df_pca, ax=ax)
            handles, labels = ax.get_legend_handles_labels()
            ax.legend(handles, labels, fontsize=6)
        else:
            ax.scatter(df_pca["PC1"], df_pca["PC2"], s=8)
        xlim, ylim = ax.get_xlim(), ax.get_ylim()
        lims = [min(xlim[0], ylim[0]), max(xlim[1], ylim[1])]
        ax.set_xlim(lims)
        ax.set_ylim(lims)
        ax.set_aspect("equal", adjustable="box")
        plt.savefig(os.path.join(
            output_dir, f"{config.trainer_version}_pca_latent_space_test_set.pdf"),
            format="pdf", bbox_inches="tight")
        plt.close()
        print(f"PCA Explained Variance Ratio: {ratio}")
        print(f"Total Explained Variance: {ratio.sum():.3f}")
    return df_pca


def plot_latent_dimensions_distribution(latents, output_dir):
    """Per-dimension latent histograms (visualise.py:84-121)."""
    os.makedirs(output_dir, exist_ok=True)
    latents = np.asarray(latents)
    n_dims = latents.shape[1]
    n_cols = 4
    n_rows = (n_dims + n_cols - 1) // n_cols
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(15, 3 * n_rows), dpi=150)
    axes = np.atleast_1d(axes).ravel()
    for i in range(n_dims):
        axes[i].hist(latents[:, i], bins=30, alpha=0.7, color="skyblue",
                     edgecolor="black")
        axes[i].set_title(f"Latent Dim {i + 1}", fontsize=10)
        axes[i].set_xlabel("Value")
        axes[i].set_ylabel("Frequency")
        axes[i].grid(True, alpha=0.3)
    for i in range(n_dims, len(axes)):
        axes[i].set_visible(False)
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "latent_dimensions_distribution.pdf"),
                format="pdf", bbox_inches="tight")
    plt.close()


def plot_reconstruction_examples(originals, reconstructions, output_dir,
                                 n_examples: int = 5):
    """Original-vs-reconstruction line plots (visualise.py:124-176)."""
    os.makedirs(output_dir, exist_ok=True)
    n = min(n_examples, len(originals))
    for i in range(n):
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        ax1.plot(np.asarray(originals[i]), alpha=0.7)
        ax1.set_title(f"Original Sample {i + 1}")
        ax1.set_xlabel("Gene Index")
        ax1.set_ylabel("Presence")
        ax2.plot(np.asarray(reconstructions[i]), alpha=0.7, color="orange")
        ax2.set_title(f"Reconstructed Sample {i + 1}")
        ax2.set_xlabel("Gene Index")
        ax2.set_ylabel("Probability")
        plt.tight_layout()
        plt.savefig(os.path.join(output_dir, f"reconstruction_example_{i + 1}.pdf"),
                    format="pdf", bbox_inches="tight")
        plt.close()


def generate_metric_histograms(f1_scores, accuracy_scores, config, output_dir):
    """F1 and accuracy histograms (metrics.py:67-121)."""
    os.makedirs(output_dir, exist_ok=True)
    plt.figure(figsize=(4, 4), dpi=300)
    plt.hist(f1_scores, color="dodgerblue")
    plt.xlabel("F1 score")
    plt.ylabel("Frequency")
    plt.grid(True, alpha=0.3)
    plt.xlim(0.9, 1)
    plt.tight_layout()
    median_f1 = np.median(f1_scores)
    plt.axvline(median_f1, color="red", linestyle="--", alpha=0.8,
                label=f"Median: {median_f1:.3f}")
    plt.legend()
    plt.savefig(os.path.join(
        output_dir, f"{config.trainer_version}_f1_score_frequency_test_set.pdf"),
        format="pdf", bbox_inches="tight")
    plt.close()

    plt.figure(figsize=(4, 4), dpi=300)
    plt.hist(accuracy_scores, color="dodgerblue")
    plt.xlabel("Accuracy Score")
    plt.ylabel("Frequency")
    plt.grid(True, alpha=0.3)
    mean_acc = np.mean(accuracy_scores)
    plt.axvline(mean_acc, color="darkred", linestyle="--", alpha=0.8,
                label=f"Mean: {mean_acc:.3f}")
    plt.legend()
    plt.savefig(os.path.join(
        output_dir, f"{config.trainer_version}_accuracy_score_frequency_test_set.pdf"),
        format="pdf", bbox_inches="tight")
    plt.close()


def create_training_summary_plot(train_losses: List[float], val_losses: List[float],
                                 f1_scores: Sequence[float],
                                 accuracy_scores: Sequence[float],
                                 output_dir: str, model_name: str = "VAE"):
    """2x2 training summary panel (visualise.py:179-256)."""
    os.makedirs(output_dir, exist_ok=True)
    fig, axes = plt.subplots(2, 2, figsize=(12, 10), dpi=150)
    epochs = range(1, len(train_losses) + 1)
    axes[0, 0].plot(epochs, train_losses, label="Training Loss", color="blue", alpha=0.8)
    axes[0, 0].plot(epochs, val_losses, label="Validation Loss", color="red", alpha=0.8)
    axes[0, 0].set_xlabel("Epochs")
    axes[0, 0].set_ylabel("Loss")
    axes[0, 0].set_title(f"{model_name} Training Curves")
    axes[0, 0].legend()
    axes[0, 0].grid(True, alpha=0.3)

    axes[0, 1].hist(f1_scores, bins=30, alpha=0.7, color="green", edgecolor="black")
    axes[0, 1].axvline(np.mean(f1_scores), color="darkgreen", linestyle="--",
                       label=f"Mean: {np.mean(f1_scores):.3f}")
    axes[0, 1].set_xlabel("F1 Score")
    axes[0, 1].set_ylabel("Frequency")
    axes[0, 1].set_title("F1 Score Distribution")
    axes[0, 1].legend()
    axes[0, 1].grid(True, alpha=0.3)

    axes[1, 0].hist(accuracy_scores, bins=30, alpha=0.7, color="purple",
                    edgecolor="black")
    axes[1, 0].axvline(np.mean(accuracy_scores), color="darkviolet", linestyle="--",
                       label=f"Mean: {np.mean(accuracy_scores):.3f}")
    axes[1, 0].set_xlabel("Accuracy Score")
    axes[1, 0].set_ylabel("Frequency")
    axes[1, 0].set_title("Accuracy Distribution")
    axes[1, 0].legend()
    axes[1, 0].grid(True, alpha=0.3)

    axes[1, 1].axis("off")
    summary_text = f"""
    {model_name} Training Summary

    Final Training Loss: {train_losses[-1]:.4f}
    Final Validation Loss: {val_losses[-1]:.4f}

    F1 Score Statistics:
    - Mean: {np.mean(f1_scores):.4f}
    - Std:  {np.std(f1_scores):.4f}
    - Min:  {np.min(f1_scores):.4f}
    - Max:  {np.max(f1_scores):.4f}

    Accuracy Statistics:
    - Mean: {np.mean(accuracy_scores):.4f}
    - Std:  {np.std(accuracy_scores):.4f}
    - Min:  {np.min(accuracy_scores):.4f}
    - Max:  {np.max(accuracy_scores):.4f}

    Total Epochs: {len(train_losses)}
    """
    axes[1, 1].text(0.1, 0.9, summary_text, transform=axes[1, 1].transAxes,
                    fontsize=11, verticalalignment="top",
                    bbox=dict(boxstyle="round", facecolor="lightgray", alpha=0.5))
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, f"{model_name}_training_summary.pdf"),
                format="pdf", bbox_inches="tight")
    plt.close()
