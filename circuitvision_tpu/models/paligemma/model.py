"""PaliGemma: SigLIP tower + projector + Gemma decoder, with a
jit-compiled greedy decode loop.

Composition and numerics per the HF reference
(transformers/models/paligemma/modeling_paligemma.py):
- vision features → linear projector → divided by sqrt(text hidden);
- substituted for the image placeholder tokens in the UNSCALED token
  embeddings, then the whole sequence is scaled by sqrt(hidden) inside
  the decoder;
- position ids are 1-indexed (cache position + 1);
- inference prefill attends BIDIRECTIONALLY over the full input (the
  reference's non-training mask zeroes the whole prefix block); padding
  is masked via attention_mask; decode steps attend to every cache slot
  up to and including their own position.

TPU design: one jit program for prefill (per (B, S, T_max) shape) and a
single lax.while_loop jit program for the whole greedy generation — one
device dispatch per batch instead of one per token, which matters over
a remote-tunnel dispatch path. Shapes are fully static; early stop when
every row has emitted EOS.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct as flax_struct

from .config import PaliGemmaConfig
from .gemma import GemmaDecoder, make_kv_cache
from .vision import SiglipVisionTower


class QuantEmbed(nn.Module):
    """Weight-only int8 tied embedding / LM head (per-row scales).

    lookup reads one row per token (dequant trivially); attend — the
    (hidden @ E^T) LM-head matmul, by far the largest single per-step
    parameter read at vocab 257k — streams the int8 table with a fused
    upcast and applies the row scales to the logits after the dot
    (exact when scales are powers of two)."""

    num_embeddings: int
    features: int
    dtype: Any = jnp.float32

    def setup(self):
        self.embedding_q = self.param(
            "embedding_q",
            lambda _key, shape: jnp.zeros(shape, jnp.int8),
            (self.num_embeddings, self.features),
        )
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.num_embeddings,)
        )

    def __call__(self, ids: jax.Array) -> jax.Array:
        rows = self.embedding_q[ids].astype(jnp.float32)
        return (rows * self.scale[ids][..., None]).astype(self.dtype)

    def attend(self, hidden: jax.Array) -> jax.Array:
        # Same contraction form as flax nn.Embed.attend (jnp.dot against
        # embedding.T) so the accumulation order — and therefore the
        # power-of-two-scale exactness pin — matches the float path
        # bitwise; XLA lowers the .T to dot dimension numbers, not a
        # physical transpose.
        logits = jnp.dot(hidden, self.embedding_q.astype(self.dtype).T)
        return (logits.astype(jnp.float32) * self.scale).astype(self.dtype)


class PaliGemma(nn.Module):
    cfg: PaliGemmaConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        assert c.projection_dim == c.text.hidden_size, (
            "projector output must match the text width"
        )
        self.vision_tower = SiglipVisionTower(c.vision, dtype=self.dtype)
        self.projector = nn.Dense(c.projection_dim, dtype=self.dtype, name="projector")
        if c.text.quant_int8:
            self.embed_tokens = QuantEmbed(
                c.text.vocab_size, c.text.hidden_size, dtype=self.dtype,
                name="embed_tokens",
            )
        else:
            self.embed_tokens = nn.Embed(
                c.text.vocab_size, c.text.hidden_size, dtype=self.dtype,
                name="embed_tokens",
            )
        self.decoder = GemmaDecoder(c.text, dtype=self.dtype)

    def _logits(self, hidden: jax.Array) -> jax.Array:
        # weight-tied LM head (reference: lm_head.weight == embed_tokens.weight)
        return self.embed_tokens.attend(hidden)

    def image_features(self, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision_tower(pixel_values)
        feats = self.projector(feats)
        return feats / jnp.asarray(
            self.cfg.text.hidden_size**0.5, dtype=feats.dtype
        )

    def prefill(
        self,
        input_ids: jax.Array,  # (B, S) with image_token_id placeholders
        attn_mask: jax.Array,  # (B, S) 1 = real token
        k_caches: jax.Array,  # (L, B, T, n_kv, hd)
        v_caches: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # (B, H, W, 3)
    ):
        """Returns (logits (B, S, V), k_caches, v_caches)."""
        c = self.cfg
        embeds = self.embed_tokens(input_ids)
        if pixel_values is not None:
            feats = self.image_features(pixel_values).astype(embeds.dtype)
            # The canonical PaliGemma layout puts the image tokens FIRST
            # (processor: [image]*N + bos + prompt), so substitution is a
            # static slice — but gated on the placeholder id like the
            # reference's masked_scatter, so a caller that violates the
            # layout keeps its real token embeddings instead of having
            # them silently overwritten.
            n = feats.shape[1]
            is_placeholder = (input_ids[:, :n] == c.image_token_id)[..., None]
            head = jnp.where(is_placeholder, feats, embeds[:, :n])
            embeds = jnp.concatenate([head, embeds[:, n:]], axis=1)
        b, s = input_ids.shape
        t = k_caches.shape[2]
        neg = jnp.finfo(jnp.float32).min
        # bidirectional over valid input tokens; future cache slots masked
        valid = jnp.concatenate(
            [attn_mask.astype(bool), jnp.zeros((b, t - s), bool)], axis=1
        )
        bias = jnp.where(valid, 0.0, neg).astype(jnp.float32)[:, None, None, :]
        bias = jnp.broadcast_to(bias, (b, 1, s, t))
        position_ids = jnp.arange(s, dtype=jnp.int32)[None] + 1  # 1-indexed
        position_ids = jnp.broadcast_to(position_ids, (b, s))
        hidden, k_caches, v_caches = self.decoder(
            embeds, bias, position_ids, k_caches, v_caches, 0
        )
        return self._logits(hidden), k_caches, v_caches

    def decode_step(
        self,
        token: jax.Array,  # (B,) int32
        pos: jax.Array,  # scalar int32 — cache slot this token occupies
        prefill_mask: jax.Array,  # (B, S_prefill) original attn mask
        k_caches: jax.Array,
        v_caches: jax.Array,
    ):
        """One greedy step; returns (logits (B, V), k_caches, v_caches)."""
        b = token.shape[0]
        t = k_caches.shape[2]
        s_pre = prefill_mask.shape[1]
        neg = jnp.finfo(jnp.float32).min
        slots = jnp.arange(t)
        # prefill slots gated by the original mask; generated slots by <= pos
        gen_ok = slots[None, :] <= pos
        pre_ok = jnp.concatenate(
            [prefill_mask.astype(bool), jnp.zeros((b, t - s_pre), bool)], axis=1
        )
        valid = jnp.where(slots[None, :] < s_pre, pre_ok, gen_ok)
        bias = jnp.where(valid, 0.0, neg).astype(jnp.float32)[:, None, None, :]
        position_ids = jnp.broadcast_to(pos[None, None] + 1, (b, 1)).astype(jnp.int32)
        embeds = self.embed_tokens(token[:, None])
        hidden, k_caches, v_caches = self.decoder(
            embeds, bias, position_ids, k_caches, v_caches, pos
        )
        return self._logits(hidden[:, 0]), k_caches, v_caches


@flax_struct.dataclass
class GenerateResult:
    tokens: jax.Array  # (B, max_new) int32, PAD after EOS
    # emitted tokens incl. the EOS — tracked per step, NOT inferred from
    # pad scanning (a model legitimately emitting pad_token_id mid-stream
    # must not truncate the row)
    lengths: jax.Array  # (B,) int32


@functools.partial(jax.jit, static_argnums=(0, 5))
def greedy_generate(
    model: PaliGemma,
    variables,
    input_ids: jax.Array,  # (B, S) uniform-length prompts (no padding)
    pixel_values: jax.Array,
    rows_valid: jax.Array,  # (B,) bool — inactive rows decode but are ignored
    max_new_tokens: int,
) -> GenerateResult:
    """Whole greedy generation as ONE jit program (prefill + while_loop).

    Prompts are uniform-length by construction (the value reader uses a
    fixed prompt — see reader.py), so there is no padding and the last
    prefill logit is the first next-token distribution.
    """
    cfg = model.cfg
    b, s = input_ids.shape
    t_max = s + max_new_tokens
    attn_mask = jnp.ones((b, s), jnp.int32)
    k0, v0 = make_kv_cache(cfg.text, b, t_max, dtype=model.dtype)
    logits, kc, vc = model.apply(
        variables, input_ids, attn_mask, k0, v0, pixel_values,
        method=PaliGemma.prefill,
    )
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    tokens0 = jnp.full((b, max_new_tokens), cfg.pad_token_id, jnp.int32)
    done0 = ~rows_valid
    count0 = jnp.zeros((b,), jnp.int32)

    def cond(state):
        i, _tok, _kc, _vc, done, _count, _out = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, tok, kc, vc, done, count, out = state
        emit = jnp.where(done, cfg.pad_token_id, tok)
        out = jax.lax.dynamic_update_slice(out, emit[:, None], (0, i))
        count = count + (~done).astype(jnp.int32)
        done = done | (tok == cfg.eos_token_id)
        logits, kc, vc = model.apply(
            variables, tok, s + i, attn_mask, kc, vc,
            method=PaliGemma.decode_step,
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return i + 1, nxt, kc, vc, done, count, out

    state = (jnp.int32(0), first, kc, vc, done0, count0, tokens0)
    _i, _tok, _kc, _vc, done, count, out = jax.lax.while_loop(cond, body, state)
    return GenerateResult(tokens=out, lengths=count)
