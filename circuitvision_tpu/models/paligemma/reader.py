"""On-TPU VLM value reader: PaliGemma behind the pipeline's VLMClient
protocol (BASELINE.json config 5 — the stretch goal replacing the
reference's external Gemini stage-2 HTTP call, src/utils.py:184-285,
and the per-component direction call, src/circuit_analyzer.py:2036-2143).

The reader keeps the reference's *interface contract*: get_labels takes
the enumerated RGB image and must yield the same `[{'id','class','value'}]`
records the external VLM returns (parsed with the SAME parse_vlm_list
used for the HTTP clients, so downstream fix_netlist semantics are
shared); get_direction takes a component crop and must yield
(direction, reason).

Tokenizer: PaliGemma's SentencePiece model is a gated artifact that is
not present in this environment (the same situation as the SAM2/YOLO
fine-tuned weights — see PARITY.md). The reader therefore accepts any
(encode, decode) pair; `ByteTokenizer` is a self-contained fallback
that makes the whole device path executable end-to-end (with random
weights it produces noise — the tests pin the MACHINERY: prompt layout,
image-token prefix, greedy loop, parsing), while production use loads
the converted checkpoint plus the real tokenizer via `encode_fn`/
`decode_fn`.

TPU notes: SigLIP preprocessing (resize to 224², scale to [-1, 1]) is a
jitted device program; generation is one jit dispatch per batch
(model.greedy_generate). Batched over enumerated images when the caller
has many.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import PaliGemmaConfig
from .model import PaliGemma, greedy_generate


class ByteTokenizer:
    """UTF-8 byte fallback tokenizer.

    ids 0..255 = bytes shifted into the tail of the vocab is NOT done —
    instead bytes map to ids [base, base+256) so the special ids
    (pad/eos/bos/image) keep their PaliGemma positions. Requires
    vocab_size >= base + 256."""

    def __init__(self, cfg: PaliGemmaConfig, base: int = 16):
        if cfg.text.vocab_size < base + 256:
            raise ValueError("vocab too small for the byte tokenizer")
        reserved = {cfg.pad_token_id, cfg.eos_token_id, cfg.bos_token_id,
                    cfg.image_token_id}
        if any(base <= r < base + 256 for r in reserved):
            raise ValueError("byte range collides with special ids")
        self.base = base

    def encode(self, text: str) -> list[int]:
        return [self.base + b for b in text.encode("utf-8")]

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(
            i - self.base for i in ids if self.base <= i < self.base + 256
        )
        return data.decode("utf-8", errors="replace")


def siglip_rescale(x: jax.Array) -> jax.Array:
    # SigLIP normalization: uint8 [0,255] → [-1, 1] (mean/std 0.5).
    return x / 127.5 - 1.0


def preprocess_images(
    images: Sequence[np.ndarray], image_size: int
) -> jax.Array:
    """RGB uint8 arrays (any sizes) → (B, S, S, 3) f32 in [-1, 1].

    Antialiased bilinear resize (ops.image.resize_bilinear with
    antialias=True — the PIL-convention arm, which is what HF's
    SiglipImageProcessor uses via PIL.Image.BILINEAR); exact HF-processor
    pixel parity is pinned only for same-size inputs (tests)."""
    from ...ops.image import resize_bilinear

    out = []
    for img in images:
        x = jnp.asarray(img, jnp.float32)
        if x.shape[:2] != (image_size, image_size):
            x = resize_bilinear(x, (image_size, image_size), antialias=True)
        out.append(siglip_rescale(x))
    return jnp.stack(out)


# The stage-2 ask, condensed to PaliGemma's short-instruction style (the
# verbatim reference prompt in enrich/prompts.py targets a chat model;
# PaliGemma-class models are steered with short task prefixes).
LABELS_TASK = "extract component id, class, value as JSON list"
DIRECTION_TASK = "which direction does the component point; answer UP, DOWN, LEFT or RIGHT and SIGN or ARROW"


@dataclasses.dataclass
class PaliGemmaValueReader:
    """VLMClient implementation backed by the on-device PaliGemma."""

    cfg: PaliGemmaConfig
    variables: dict
    encode_fn: Optional[Callable[[str], list[int]]] = None
    decode_fn: Optional[Callable[[Sequence[int]], str]] = None
    max_new_tokens: int = 256
    # Direction answers are two words ("RIGHT ARROW") — ~3 SentencePiece
    # or ~11 byte-fallback tokens. A per-task budget keeps the decode
    # while_loop and the static KV cache (t_max = prompt + budget) sized
    # to the answer instead of the stage-2 JSON budget: fewer loop trips
    # when EOS never fires (random/misbehaving weights) and cheaper
    # cache-wide attention reads on every decode step either way.
    direction_max_new_tokens: int = 16
    dtype: object = jnp.float32

    def __post_init__(self):
        self.model = PaliGemma(self.cfg, dtype=self.dtype)
        if self.encode_fn is None or self.decode_fn is None:
            bt = ByteTokenizer(self.cfg)
            self.encode_fn = self.encode_fn or bt.encode
            self.decode_fn = self.decode_fn or bt.decode

    def build_prompt_ids(self, task: str) -> list[int]:
        """Canonical PaliGemma layout: [image]*N + BOS + task + \\n."""
        c = self.cfg
        return (
            [c.image_token_id] * c.num_image_tokens
            + [c.bos_token_id]
            + list(self.encode_fn(task))
            + list(self.encode_fn("\n"))
        )

    def generate(
        self,
        images: Sequence[np.ndarray],
        task: str,
        max_new_tokens: Optional[int] = None,
    ) -> list[str]:
        """Batched greedy decode; one jit dispatch for the whole batch.

        The batch is padded up to a power-of-two bucket (blank pixels,
        rows_valid=False — padded rows emit pad tokens and are sliced
        off) so arbitrary caller batch sizes reuse a handful of compiled
        programs instead of one ~minutes-long XLA compile per distinct
        size (direction batches vary per chunk)."""
        c = self.cfg
        b = len(images)
        bucket = 1
        while bucket < b:
            bucket *= 2
        pixels = preprocess_images(images, c.vision.image_size)
        if bucket > b:
            pad = jnp.zeros((bucket - b,) + pixels.shape[1:], pixels.dtype)
            pixels = jnp.concatenate([pixels, pad], axis=0)
        ids = self.build_prompt_ids(task)
        input_ids = jnp.asarray([ids] * bucket, jnp.int32)
        valid = jnp.asarray([True] * b + [False] * (bucket - b))
        res = greedy_generate(
            self.model, self.variables, input_ids, pixels, valid,
            max_new_tokens if max_new_tokens is not None
            else self.max_new_tokens,
        )
        toks = np.asarray(res.tokens)[:b]
        lens = np.asarray(res.lengths)[:b]
        texts = []
        for row, n in zip(toks, lens):
            seq = [t for t in row[:n] if t != c.eos_token_id]
            texts.append(self.decode_fn(seq))
        return texts

    # ---- VLMClient protocol ----

    def get_labels(self, enum_image_rgb: np.ndarray) -> list[dict]:
        from ...enrich.client import parse_vlm_list

        text = self.generate([enum_image_rgb], LABELS_TASK)[0]
        return parse_vlm_list(text)

    def get_labels_batch(
        self, enum_images_rgb: Sequence[np.ndarray]
    ) -> list[Optional[list[dict]]]:
        """Batched stage-2: ONE device dispatch for the whole batch (the
        decode loop is parameter-read-bound, so batch 8 costs ~1.3× batch
        1 — PERF.md), with per-image failure isolation: an unparseable
        row yields None (the caller keeps that image's valueless netlist,
        the same ladder as the per-image path)."""
        import logging

        from ...enrich.client import parse_vlm_list

        texts = self.generate(list(enum_images_rgb), LABELS_TASK)
        out: list[Optional[list[dict]]] = []
        for i, text in enumerate(texts):
            try:
                out.append(parse_vlm_list(text))
            except Exception as e:
                logging.getLogger(__name__).warning(
                    "stage-2 parse failed for image %d: %s", i, e
                )
                out.append(None)
        return out

    @staticmethod
    def _parse_direction(text: str) -> tuple[str, str]:
        import re

        text = text.upper()
        # first whole-word occurrence IN TEXT ORDER ("supply points DOWN"
        # must not match the UP inside SUPPLY)
        dm = re.search(r"\b(UP|DOWN|LEFT|RIGHT)\b", text)
        rm = re.search(r"\b(SIGN|ARROW)\b", text)
        return (dm.group(1) if dm else "UNKNOWN",
                rm.group(1) if rm else "UNKNOWN")

    def get_direction(
        self, crop_rgb: np.ndarray, component_class: str
    ) -> tuple[str, str]:
        text = self.generate(
            [crop_rgb], DIRECTION_TASK,
            max_new_tokens=self.direction_max_new_tokens,
        )[0]
        return self._parse_direction(text)

    def get_directions_batch(
        self, crops_rgb: Sequence[np.ndarray], component_classes: Sequence[str]
    ) -> list[tuple[str, str]]:
        """All of an image's eligible component crops in ONE greedy-decode
        dispatch (enrich_directions batched path). The direction prompt is
        class-independent (same task prefix for sources and diodes — as is
        the per-image reference prompt pair's shared structure), so the
        crops batch cleanly; per-crop parse failures yield UNKNOWN."""
        texts = self.generate(
            list(crops_rgb), DIRECTION_TASK,
            max_new_tokens=self.direction_max_new_tokens,
        )
        return [self._parse_direction(t) for t in texts]
