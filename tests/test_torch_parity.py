"""Numerical parity of converted building blocks against torch references.

Full-checkpoint parity (SURVEY.md §4 item 3) needs the real weights, which
this environment cannot fetch; these tests validate the conversion rules
at the layer level instead: same random weights pushed through torch and
through the converted Flax module must agree.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import pytest as _pytest


@_pytest.fixture(autouse=True)
def _exact_matmuls():
    """JAX's default matmul precision runs f32 convs with bf16 passes
    (measured 0.08 abs error on a tiny conv); parity tests need exact f32.
    """
    with jax.default_matmul_precision("highest"):
        yield


class TestConvBNParity:
    def test_conv_bn_silu_matches_ultralytics_conv(self):
        """ultralytics Conv = Conv2d(bias=False) + BatchNorm2d(eps=1e-3) + SiLU."""
        import flax.linen as fnn

        from circuitvision_tpu.models.layers import ConvBN

        rng = np.random.default_rng(0)
        cin, cout, k = 6, 8, 3
        w = rng.normal(size=(cout, cin, k, k)).astype(np.float32)
        gamma = rng.normal(1, 0.1, cout).astype(np.float32)
        beta = rng.normal(0, 0.1, cout).astype(np.float32)
        mean = rng.normal(0, 0.1, cout).astype(np.float32)
        var = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        x = rng.normal(size=(1, 16, 16, cin)).astype(np.float32)

        conv = torch.nn.Conv2d(cin, cout, k, padding=k // 2, bias=False)
        bn = torch.nn.BatchNorm2d(cout, eps=1e-3)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w))
            bn.weight.copy_(torch.from_numpy(gamma))
            bn.bias.copy_(torch.from_numpy(beta))
            bn.running_mean.copy_(torch.from_numpy(mean))
            bn.running_var.copy_(torch.from_numpy(var))
        bn.eval()
        ref = torch.nn.functional.silu(bn(conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))))
        ref = ref.detach().numpy().transpose(0, 2, 3, 1)

        mod = ConvBN(features=cout, kernel=k)
        variables = {
            "params": {
                "conv": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))},
                "bn": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
            },
            "batch_stats": {"bn": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}},
        }
        out = np.asarray(mod.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


class TestAttentionParity:
    def test_sam_attention_matches_torch(self):
        """SAM decoder Attention (downsample 2) vs a hand-built torch twin."""
        from circuitvision_tpu.models.sam2.decoder import Attention

        rng = np.random.default_rng(1)
        dim, heads, ds = 64, 4, 2
        internal = dim // ds
        wq = rng.normal(size=(internal, dim)).astype(np.float32) * 0.1
        wk = rng.normal(size=(internal, dim)).astype(np.float32) * 0.1
        wv = rng.normal(size=(internal, dim)).astype(np.float32) * 0.1
        wo = rng.normal(size=(dim, internal)).astype(np.float32) * 0.1
        bq, bk, bv, bo = (rng.normal(size=s).astype(np.float32) * 0.01 for s in
                          (internal, internal, internal, dim))
        q = rng.normal(size=(2, 5, dim)).astype(np.float32)
        k = rng.normal(size=(2, 7, dim)).astype(np.float32)
        v = rng.normal(size=(2, 7, dim)).astype(np.float32)

        def torch_attn():
            tq = torch.from_numpy(q) @ torch.from_numpy(wq).T + torch.from_numpy(bq)
            tk = torch.from_numpy(k) @ torch.from_numpy(wk).T + torch.from_numpy(bk)
            tv = torch.from_numpy(v) @ torch.from_numpy(wv).T + torch.from_numpy(bv)
            hd = internal // heads

            def split(x):
                b, n, _ = x.shape
                return x.reshape(b, n, heads, hd).transpose(1, 2)

            qh, kh, vh = split(tq), split(tk), split(tv)
            attn = torch.softmax(qh @ kh.transpose(-1, -2) / hd**0.5, dim=-1)
            out = (attn @ vh).transpose(1, 2).reshape(2, 5, internal)
            return (out @ torch.from_numpy(wo).T + torch.from_numpy(bo)).numpy()

        variables = {
            "params": {
                "q_proj": {"kernel": jnp.asarray(wq.T), "bias": jnp.asarray(bq)},
                "k_proj": {"kernel": jnp.asarray(wk.T), "bias": jnp.asarray(bk)},
                "v_proj": {"kernel": jnp.asarray(wv.T), "bias": jnp.asarray(bv)},
                "out_proj": {"kernel": jnp.asarray(wo.T), "bias": jnp.asarray(bo)},
            }
        }
        mod = Attention(embedding_dim=dim, num_heads=heads, downsample_rate=ds)
        out = np.asarray(mod.apply(variables, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        np.testing.assert_allclose(out, torch_attn(), rtol=2e-3, atol=2e-3)


class TestLayerNormParity:
    def test_flax_ln_matches_torch(self):
        import flax.linen as fnn

        rng = np.random.default_rng(2)
        x = rng.normal(size=(3, 10, 32)).astype(np.float32)
        g = rng.normal(1, 0.1, 32).astype(np.float32)
        b = rng.normal(0, 0.1, 32).astype(np.float32)
        tln = torch.nn.LayerNorm(32, eps=1e-6)
        with torch.no_grad():
            tln.weight.copy_(torch.from_numpy(g))
            tln.bias.copy_(torch.from_numpy(b))
        ref = tln(torch.from_numpy(x)).detach().numpy()
        mod = fnn.LayerNorm(epsilon=1e-6)
        out = np.asarray(
            mod.apply({"params": {"scale": jnp.asarray(g), "bias": jnp.asarray(b)}}, jnp.asarray(x))
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestGeluErf:
    def test_polynomial_erf_gelu(self):
        from circuitvision_tpu.ops.pallas.refinement_fused import _gelu_exact

        x = np.linspace(-6, 6, 1001).astype(np.float32)
        ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
        out = np.asarray(_gelu_exact(jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, atol=2e-6)
