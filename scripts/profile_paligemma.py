"""Profile the PaliGemma-3B VLM head on the TPU chip (PERF.md round-3
pending item — the tunnel was down when the head landed).

Measures the production shape of the value-reader call
(reader.py: generate): prefill over [256 image tokens + BOS + task]
followed by a greedy lax.while_loop decode, ALL as one jit dispatch per
batch. Random bf16 weights — timing is weight-independent; the EOS
early-exit is statistically never hit by argmax over 257k random logits,
so every run decodes the full max_new_tokens (worst case = honest
serving bound).

Params are generated ON DEVICE in bf16 from the init eval_shape tree
(one jitted normal per leaf): a 3B f32 on-device init would peak ~12 GB
and then need a cast copy, and host-built params would push 6 GB through
the ~14 MB/s tunnel (~7 min). Device-side bf16 init keeps HBM at ~6 GB
and uploads nothing.

Usage: python scripts/profile_paligemma.py [batch ...] [--new N]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from circuitvision_tpu.models.paligemma.config import PaliGemmaConfig
from circuitvision_tpu.models.paligemma.gemma import make_kv_cache
from circuitvision_tpu.models.paligemma.model import PaliGemma, greedy_generate
from circuitvision_tpu.models.paligemma.reader import (
    ByteTokenizer, LABELS_TASK,
)


def device_random_params(model, cfg, seed=0):
    """bf16 random params matching the init tree, generated on device."""
    c = cfg
    s = c.num_image_tokens + 4
    t = s + 4
    ids = jnp.zeros((1, s), jnp.int32)
    mask = jnp.ones((1, s), jnp.int32)
    k0, v0 = make_kv_cache(c.text, 1, t, dtype=jnp.bfloat16)
    pix = jnp.zeros((1, c.vision.image_size, c.vision.image_size, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids, mask, k0, v0, pix,
                           method=PaliGemma.prefill)
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    total = sum(int(np.prod(l.shape)) for l in leaves)
    print(f"params: {total/1e9:.3f} B ({total*2/1e9:.2f} GB bf16)")

    @jax.jit
    def make_all(key):
        keys = jax.random.split(key, len(leaves))
        return [
            jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02
            for k, l in zip(keys, leaves)
        ]

    return jax.tree_util.tree_unflatten(treedef, make_all(jax.random.PRNGKey(seed)))


def main():
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 4, 8]
    max_new = 32
    if "--new" in sys.argv:
        max_new = int(sys.argv[sys.argv.index("--new") + 1])

    cfg = PaliGemmaConfig()
    model = PaliGemma(cfg, dtype=jnp.bfloat16)
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    variables = device_random_params(model, cfg)

    if "--int8" in sys.argv:
        import dataclasses

        from circuitvision_tpu.models.paligemma.quant import (
            quantize_variables_on_device,
        )

        variables = quantize_variables_on_device(variables)
        jax.block_until_ready(variables)
        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, quant_int8=True)
        )
        model = PaliGemma(cfg, dtype=jnp.bfloat16)
        print("int8 weight-only decode path (quant.py)")

    tok = ByteTokenizer(cfg)
    ids = (
        [cfg.image_token_id] * cfg.num_image_tokens
        + [cfg.bos_token_id] + tok.encode(LABELS_TASK) + tok.encode("\n")
    )
    print(f"prompt: {len(ids)} tokens  max_new: {max_new}")

    for b in batches:
        input_ids = jnp.asarray([ids] * b, jnp.int32)
        pixels = jnp.zeros(
            (b, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.float32
        )
        valid = jnp.ones((b,), bool)

        t0 = time.perf_counter()
        res = greedy_generate(model, variables, input_ids, pixels, valid, max_new)
        np.asarray(res.tokens)
        compile_s = time.perf_counter() - t0
        n_emitted = int(np.asarray(res.lengths).max())

        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            res = greedy_generate(
                model, variables, input_ids, pixels, valid, max_new
            )
            np.asarray(res.tokens)  # forced host readback (PERF.md methodology)
        dt = (time.perf_counter() - t0) / reps
        print(
            f"batch {b}: {dt*1e3:8.1f} ms/call  {b/dt:6.2f} img/s  "
            f"{b*max_new/dt:7.1f} tok/s decode-incl-prefill  "
            f"(compile {compile_s:.0f}s, emitted {n_emitted}/{max_new})"
        )


if __name__ == "__main__":
    main()
