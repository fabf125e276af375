"""Sampling subsystem: threshold semantics, focused-mode quirks, vectorized
essential-gene counting parity vs the reference Python loop."""

import numpy as np
import pytest

import jax

from genome_minimizer_2_tpu.models import vae
from genome_minimizer_2_tpu.sample import sampler as S

D, H, L = 45, 12, 3


@pytest.fixture(scope="module")
def sampler():
    cfg = vae.VAEConfig(input_dim=D, hidden_dim=H, latent_dim=L, pad_features=True)
    params, stats = vae.init(cfg, jax.random.key(0))
    return S.Sampler(cfg=cfg, params=params, batch_stats=stats, chunk_size=16)


def test_sample_shapes_and_threshold(sampler):
    binary, probs, z = sampler.sample(jax.random.key(1), 37, return_probs=True)
    assert binary.shape == (37, D) and probs.shape == (37, D)
    assert z.shape == (37, L)
    assert binary.dtype == np.uint8
    # strict > 0.5 threshold consistency (extras.py:201)
    np.testing.assert_array_equal(binary, (probs > 0.5).astype(np.uint8))


def test_sample_deterministic_and_chunk_invariant(sampler):
    b1, _, z1 = sampler.sample(jax.random.key(2), 40)
    b2, _, z2 = sampler.sample(jax.random.key(2), 40)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(z1, z2)
    # chunking must not change results
    big = S.Sampler(cfg=sampler.cfg, params=sampler.params,
                    batch_stats=sampler.batch_stats, chunk_size=1000)
    b3, _, z3 = big.sample(jax.random.key(2), 40)
    np.testing.assert_array_equal(z1, z3)
    np.testing.assert_array_equal(b1, b3)


def test_focused_sampling_anchor_quirk(sampler):
    """The reference computes 'latent distances' in output space, so the
    closest probe to the min-gene probe is itself (main.py:359-361). With
    noise_level=0 every focused sample then decodes the same z*."""
    binary, probs, z = sampler.sample_focused(jax.random.key(3), 5, noise_level=0.0)
    assert binary.shape == (5, D)
    assert np.all(z == z[0])
    assert np.all(binary == binary[0])


def test_focused_noise_spreads(sampler):
    _, _, z = sampler.sample_focused(jax.random.key(4), 50, noise_level=0.3)
    spread = z.std(axis=0).mean()
    assert 0.1 < spread < 0.6  # ~0.3


def test_encode_means_shape(sampler):
    x = np.random.RandomState(0).rand(23, D).round().astype(np.float32)
    means = sampler.encode_means(x, batch_size=7)
    assert means.shape == (23, L)


def test_count_essential_genes_matches_reference_loop():
    torch = pytest.importorskip("torch")  # extras imports torch
    from tests._reference import import_reference_module

    ref_extras = import_reference_module("src.genome_minimizer_2.utils.extras")
    rng = np.random.RandomState(5)
    samples = (rng.rand(30, 50) < 0.4).astype(float)
    positions = {
        "geneA": [3],
        "geneB": [7, 8, 9],
        "geneC": [49],
        "geneD": [50, 51],      # all out of range -> ignored
        "geneE": [10, 120],     # partially out of range
        "geneF": [0],
    }
    ref = ref_extras.count_essential_genes(samples, positions)
    ours = S.count_essential_genes(samples, positions)
    np.testing.assert_array_equal(ours, ref)


def test_count_essential_empty():
    samples = np.zeros((4, 10))
    assert S.count_essential_genes(samples, {}).tolist() == [0, 0, 0, 0]
    assert S.count_essential_genes(samples, {"g": [20]}).tolist() == [0, 0, 0, 0]


def test_write_samples_to_dataframe(tmp_path):
    import pandas as pd

    binary = np.array([[1, 0, 1], [0, 1, 1]], dtype=float)
    out = tmp_path / "df.csv"
    S.write_samples_to_dataframe(binary, ["gA", "gB", "gC"], str(out))
    df = pd.read_csv(out)
    assert list(df.columns) == ["Gene", "Sample_1", "Sample_2"]
    assert df["Gene"].tolist() == ["gA", "gB", "gC"]
    assert df["Sample_1"].tolist() == [1.0, 0.0, 1.0]
    assert df["Sample_2"].tolist() == [0.0, 1.0, 1.0]


def test_load_sampler_roundtrip(tmp_path):
    from genome_minimizer_2_tpu.utils import checkpoint as C
    from genome_minimizer_2_tpu.utils.config import ExperimentConfig

    cfg = vae.VAEConfig(input_dim=D, hidden_dim=H, latent_dim=L)
    params, stats = vae.init(cfg, jax.random.key(7))
    econf = ExperimentConfig(hidden_dim=H, latent_dim=L, trainer_version="v1")
    path = tmp_path / "m.npz"
    C.save_checkpoint(path, params, stats, econf, extra={"input_dim": D})
    sampler, loaded_conf = S.load_sampler(str(path))
    assert loaded_conf.trainer_version == "v1"
    b1, _, _ = sampler.sample(jax.random.key(8), 9)
    ref = S.Sampler(cfg=cfg, params=params, batch_stats=stats)
    b2, _, _ = ref.sample(jax.random.key(8), 9)
    np.testing.assert_array_equal(b1, b2)


# ---------------------------------------------------------------------------
# Mesh-parallel sampling (multi-chip serving path; reference is single-device)
# ---------------------------------------------------------------------------

def _meshed(sampler, data=8, chunk=16):
    from genome_minimizer_2_tpu.parallel import mesh as MESH

    mesh = MESH.make_mesh(data=data, model=1, devices=jax.devices()[:data])
    return S.Sampler(cfg=sampler.cfg, params=sampler.params,
                     batch_stats=sampler.batch_stats, chunk_size=chunk,
                     mesh=mesh)


def test_mesh_sampling_bitwise_matches_single_device(sampler):
    par = _meshed(sampler)
    for n in (37, 8, 3, 40):  # ragged, exact, sub-mesh, multi-chunk sizes
        b_ref, _, z_ref = sampler.sample(jax.random.key(5), n)
        b_par, _, z_par = par.sample(jax.random.key(5), n)
        np.testing.assert_array_equal(z_ref, z_par)
        np.testing.assert_array_equal(b_ref, b_par)


def test_mesh_packed_device_roundtrip(sampler):
    par = _meshed(sampler)
    z = np.asarray(jax.random.normal(jax.random.key(6), (11, L)))
    dev = par.decode_packed_device(z)
    binary = par.unpack_packed(dev, rows=11)
    np.testing.assert_array_equal(binary, sampler.decode_binary(z))


def test_mesh_tpu_route_uses_shard_map(sampler, monkeypatch):
    """Force the TPU mesh routing (shard_map around the pack kernel); on the
    CPU devices the kernel falls back to its jnp reference inside shard_map,
    so numerics still pin the wrapper end-to-end."""
    monkeypatch.setattr(S.Sampler, "_mesh_platform", lambda self: "tpu")
    par = _meshed(sampler)
    b_ref, _, _ = sampler.sample(jax.random.key(9), 24)
    b_par, _, _ = par.sample(jax.random.key(9), 24)
    np.testing.assert_array_equal(b_ref, b_par)


def test_mesh_encode_means_matches(sampler):
    par = _meshed(sampler)
    x = (np.random.RandomState(0).rand(21, D) > 0.5).astype(np.float32)
    np.testing.assert_allclose(par.encode_means(x, batch_size=8),
                               sampler.encode_means(x, batch_size=8),
                               rtol=1e-6, atol=1e-7)


def test_small_n_decodes_share_one_compiled_program():
    """n=1, n=5, n=chunk_size, and the focused probe path must all reuse ONE
    compiled decode program (round-1 VERDICT weak #5: each small n used to
    compile fresh — 60-90 s per program on the tunneled rig)."""
    cfg = vae.VAEConfig(input_dim=D, hidden_dim=H, latent_dim=L)
    params, stats = vae.init(cfg, jax.random.key(0))
    s = S.Sampler(cfg=cfg, params=params, batch_stats=stats, chunk_size=16)
    for n in (1, 5, 16, 7):
        s.sample(jax.random.key(n), n)
    assert s._decode_packed._cache_size() == 1
    # multi-chunk path with a tail still compiles no new shapes
    s.sample(jax.random.key(9), 35)  # 16 + 16 + padded tail of 3
    assert s._decode_packed._cache_size() == 1
    # focused mode (100-probe path + per-sample decode)
    s.sample_focused(jax.random.key(10), 3, n_probes=8)
    assert s._decode_packed._cache_size() == 1
    assert s._decode_probs._cache_size() == 1


# ---------------------------------------------------------------------------
# Packed bounded-memory path (round-2 VERDICT weak #3: --mode sample must not
# materialize the dense matrix at 100k scale)
# ---------------------------------------------------------------------------

def test_on_chunk_analytics_match_posthoc(sampler):
    """The per-chunk analytics hook (sample-mode overlap) must see every
    row exactly once, in order, and produce identical genome sizes /
    essential counts to the whole-array functions."""
    from genome_minimizer_2_tpu.sample.sampler import (
        count_essential_genes_packed, make_essential_counter_packed,
        popcount_rows)

    positions = {"gA": [0, 3], "gB": [5], "far": [10_000]}
    counter = make_essential_counter_packed(positions,
                                            width=sampler.cfg.input_dim)
    spans, sizes, ess = [], [], []

    def on_chunk(lo, hi, chunk):
        assert chunk.shape[0] == hi - lo
        spans.append((lo, hi))
        sizes.append(popcount_rows(chunk))
        ess.append(counter(chunk))

    packed, _ = sampler.sample_packed(jax.random.key(20), 37,
                                      on_chunk=on_chunk)
    assert spans == [(lo, min(lo + sampler.chunk_size, 37))
                     for lo in range(0, 37, sampler.chunk_size)]
    np.testing.assert_array_equal(np.concatenate(sizes),
                                  popcount_rows(packed))
    np.testing.assert_array_equal(
        np.concatenate(ess),
        count_essential_genes_packed(packed, positions,
                                     width=sampler.cfg.input_dim))


def test_sample_packed_matches_dense(sampler):
    binary, _, z = sampler.sample(jax.random.key(11), 29)
    packed, z2 = sampler.sample_packed(jax.random.key(11), 29)
    np.testing.assert_array_equal(z, z2)
    assert packed.shape == (29, (D + 7) // 8)
    np.testing.assert_array_equal(sampler.unpack_packed(packed), binary)


def test_sample_focused_packed_matches_dense(sampler):
    binary, _, z = sampler.sample_focused(jax.random.key(12), 13,
                                          noise_level=0.2, n_probes=16)
    packed, z2 = sampler.sample_focused_packed(jax.random.key(12), 13,
                                               noise_level=0.2, n_probes=16)
    np.testing.assert_array_equal(z, z2)
    np.testing.assert_array_equal(sampler.unpack_packed(packed), binary)


def test_popcount_rows_matches_dense_sum(sampler):
    packed, _ = sampler.sample_packed(jax.random.key(13), 21)
    dense = sampler.unpack_packed(packed)
    np.testing.assert_array_equal(S.popcount_rows(packed, chunk_rows=5),
                                  dense.sum(axis=1))


def test_count_essential_genes_packed_matches_dense():
    rng = np.random.RandomState(4)
    width = 43
    dense = (rng.rand(17, width) > 0.6).astype(np.uint8)
    packed = np.packbits(dense, axis=1, bitorder="little")
    positions = {"gA": [0, 5, 9], "gB": [12], "gC": [40, 42, 99],
                 "gD": [99, 120], "gE": [1]}
    np.testing.assert_array_equal(
        S.count_essential_genes_packed(packed, positions, width, chunk_rows=4),
        S.count_essential_genes(dense, positions))


def test_save_binary_npy_stream_byte_identical(tmp_path):
    rng = np.random.RandomState(5)
    dense = (rng.rand(9, D) > 0.5).astype(np.uint8)
    packed = np.packbits(dense, axis=1, bitorder="little")
    ref_path, new_path = tmp_path / "ref.npy", tmp_path / "new.npy"
    np.save(ref_path, dense.astype(np.float32))
    S.save_binary_npy_stream(packed, D, str(new_path), dtype=np.float32,
                             chunk_rows=4)
    assert new_path.read_bytes() == ref_path.read_bytes()


def test_write_samples_csv_stream_byte_identical(tmp_path):
    rng = np.random.RandomState(6)
    dense = (rng.rand(7, D) > 0.5).astype(np.uint8)
    packed = np.packbits(dense, axis=1, bitorder="little")
    genes = [f"gene_{i}" for i in range(D)]
    ref_path, new_path = tmp_path / "ref.csv", tmp_path / "new.csv"
    S.write_samples_to_dataframe(dense, genes, str(ref_path))
    S.write_samples_csv_stream(packed, genes, str(new_path), gene_chunk=10)
    assert new_path.read_bytes() == ref_path.read_bytes()


def test_sampler_pins_numpy_state_to_device(sampler):
    """Checkpoint-loaded (numpy) state must be placed on device ONCE at
    construction: jit does not cache host->device transfers of numpy
    operands, so un-pinned params re-ship per decoded chunk (~450 MB at
    flagship dims — the round-4 100k scale run found this). Decode results
    must be identical to the already-on-device sampler's."""
    cfg = sampler.cfg
    p_np = jax.tree.map(np.asarray, sampler.params)
    s_np = jax.tree.map(np.asarray, sampler.batch_stats)
    smp = S.Sampler(cfg=cfg, params=p_np, batch_stats=s_np, chunk_size=16)
    for leaf in (jax.tree.leaves(smp.params)
                 + jax.tree.leaves(smp.batch_stats)):
        assert isinstance(leaf, jax.Array), type(leaf)
    a, _, _ = smp.sample(jax.random.key(3), 21)
    b, _, _ = sampler.sample(jax.random.key(3), 21)
    np.testing.assert_array_equal(a, b)
