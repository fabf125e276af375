"""Numerical parity of the JAX VAE vs the reference torch VAE.

Strategy: initialize our model, copy the weights into the reference
architecture, and compare encode / decode / BatchNorm running-stat updates.
The stochastic reparameterization path is checked distribution-free by fixing
epsilon via logvar=-inf (std=0).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_minimizer_2_tpu.models import vae

torch = pytest.importorskip("torch")

from tests._reference import import_reference_module  # noqa: E402

ref_model = import_reference_module("src.genome_minimizer_2.training.model")

D, H, L, N = 37, 16, 4, 12


def make_pair(pad_features: bool, seed: int = 0):
    cfg = vae.VAEConfig(input_dim=D, hidden_dim=H, latent_dim=L,
                        pad_features=pad_features)
    params, stats = vae.init(cfg, jax.random.key(seed))
    tm = ref_model.VAE(D, H, L)
    _copy_params_to_torch(cfg, params, tm)
    return cfg, params, stats, tm


def _copy_params_to_torch(cfg, params, tm):
    """Copy our (in, out) weights into torch's (out, in) layers."""
    with torch.no_grad():
        for i, seq_idx in enumerate([0, 3, 6]):
            layer = params["encoder"][i]
            w = np.asarray(layer["w"])[: (cfg.input_dim if i == 0 else cfg.hidden_dim)]
            tm.encoder[seq_idx].weight.copy_(torch.tensor(w.T))
            tm.encoder[seq_idx].bias.copy_(torch.tensor(np.asarray(layer["b"])))
            bn = tm.encoder[seq_idx + 1]
            bn.weight.copy_(torch.tensor(np.asarray(layer["bn"]["scale"])))
            bn.bias.copy_(torch.tensor(np.asarray(layer["bn"]["bias"])))
        tm.mean_layer.weight.copy_(torch.tensor(np.asarray(params["mean"]["w"]).T))
        tm.mean_layer.bias.copy_(torch.tensor(np.asarray(params["mean"]["b"])))
        tm.logvar_layer.weight.copy_(torch.tensor(np.asarray(params["logvar"]["w"]).T))
        tm.logvar_layer.bias.copy_(torch.tensor(np.asarray(params["logvar"]["b"])))
        for i, seq_idx in enumerate([0, 3, 6]):
            layer = params["decoder"][i]
            tm.decoder[seq_idx].weight.copy_(torch.tensor(np.asarray(layer["w"]).T))
            tm.decoder[seq_idx].bias.copy_(torch.tensor(np.asarray(layer["b"])))
            bn = tm.decoder[seq_idx + 1]
            bn.weight.copy_(torch.tensor(np.asarray(layer["bn"]["scale"])))
            bn.bias.copy_(torch.tensor(np.asarray(layer["bn"]["bias"])))
        out = params["decoder"][3]
        tm.decoder[9].weight.copy_(
            torch.tensor(np.asarray(out["w"])[:, : cfg.input_dim].T))
        tm.decoder[9].bias.copy_(
            torch.tensor(np.asarray(out["b"])[: cfg.input_dim]))


@pytest.mark.parametrize("pad_features", [False, True])
def test_encode_parity_eval(pad_features):
    cfg, params, stats, tm = make_pair(pad_features)
    x = np.random.RandomState(1).rand(N, D).round().astype(np.float32)
    tm.eval()
    with torch.no_grad():
        mean_t, logvar_t = tm.encode(torch.tensor(x))
    mean_j, logvar_j, _ = vae.encode(cfg, params, stats, cfg.pad_inputs(jnp.asarray(x)),
                                     train=False)
    np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(), atol=2e-5)


@pytest.mark.parametrize("pad_features", [False, True])
def test_decode_parity_eval(pad_features):
    cfg, params, stats, tm = make_pair(pad_features)
    z = np.random.RandomState(2).randn(N, L).astype(np.float32)
    tm.eval()
    with torch.no_grad():
        probs_t = tm.decode(torch.tensor(z))
    logits_j, _ = vae.decode_logits(cfg, params, stats, jnp.asarray(z), train=False)
    probs_j = np.asarray(jax.nn.sigmoid(logits_j))[:, : cfg.input_dim]
    np.testing.assert_allclose(probs_j, probs_t.numpy(), atol=2e-5)


@pytest.mark.parametrize("pad_features", [False, True])
def test_train_mode_forward_and_bn_stats(pad_features):
    """Train-mode BN: normalize with biased batch var, update running stats
    with momentum 0.1 and unbiased var — must match torch exactly."""
    cfg, params, stats, tm = make_pair(pad_features)
    x = np.random.RandomState(3).rand(N, D).round().astype(np.float32)
    tm.train()
    mean_t, logvar_t = tm.encode(torch.tensor(x))
    mean_j, logvar_j, new_enc_stats = vae.encode(
        cfg, params, stats, cfg.pad_inputs(jnp.asarray(x)), train=True)
    np.testing.assert_allclose(np.asarray(mean_j), mean_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.detach().numpy(), atol=2e-5)
    for i, seq_idx in enumerate([1, 4, 7]):
        bn = tm.encoder[seq_idx]
        np.testing.assert_allclose(
            np.asarray(new_enc_stats[i]["mean"]), bn.running_mean.numpy(), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(new_enc_stats[i]["var"]), bn.running_var.numpy(), atol=2e-5)


def test_reparameterize_is_mean_when_std_zero():
    key = jax.random.key(0)
    mean = jnp.arange(8.0).reshape(2, 4)
    logvar = jnp.full((2, 4), -1e9)
    z = vae.reparameterize(key, mean, logvar)
    np.testing.assert_allclose(np.asarray(z), np.asarray(mean), atol=1e-6)


def test_reparameterize_statistics():
    key = jax.random.key(0)
    mean = jnp.zeros((20000, 2))
    logvar = jnp.full((20000, 2), np.log(4.0))  # std=2
    z = np.asarray(vae.reparameterize(key, mean, logvar))
    assert abs(z.mean()) < 0.05
    assert abs(z.std() - 2.0) < 0.05


def test_xavier_init_statistics():
    """Xavier uniform bound sqrt(6/(fan_in+fan_out)), zero biases (model.py:115-120)."""
    cfg = vae.VAEConfig(input_dim=200, hidden_dim=64, latent_dim=8, pad_features=False)
    params, _ = vae.init(cfg, jax.random.key(0))
    w = np.asarray(params["encoder"][0]["w"])
    bound = np.sqrt(6.0 / (200 + 64))
    assert w.max() <= bound and w.min() >= -bound
    assert w.max() > 0.8 * bound  # actually fills the range
    assert np.all(np.asarray(params["encoder"][0]["b"]) == 0)


def test_padding_is_inert():
    """Padded model must produce identical outputs to unpadded."""
    cfg_p = vae.VAEConfig(input_dim=D, hidden_dim=H, latent_dim=L, pad_features=True)
    cfg_u = vae.VAEConfig(input_dim=D, hidden_dim=H, latent_dim=L, pad_features=False)
    params_p, stats_p = vae.init(cfg_p, jax.random.key(5))
    params_u, stats_u = vae.init(cfg_u, jax.random.key(5))
    # same key -> same values on the true-dim slices
    x = np.random.RandomState(4).rand(N, D).round().astype(np.float32)
    m_p, lv_p, _ = vae.encode(cfg_p, params_p, stats_p, cfg_p.pad_inputs(jnp.asarray(x)), False)
    m_u, lv_u, _ = vae.encode(cfg_u, params_u, stats_u, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_u), atol=1e-5)

    assert cfg_p.padded_dim % 128 == 0
    w0 = np.asarray(params_p["encoder"][0]["w"])
    assert np.all(w0[D:] == 0.0)
    wout = np.asarray(params_p["decoder"][3]["w"])
    assert np.all(wout[:, D:] == 0.0)


def test_param_count_matches_torch():
    cfg = vae.VAEConfig(input_dim=D, hidden_dim=H, latent_dim=L)
    tm = ref_model.VAE(D, H, L)
    torch_count = sum(p.numel() for p in tm.parameters())
    assert vae.param_count(cfg) == torch_count
