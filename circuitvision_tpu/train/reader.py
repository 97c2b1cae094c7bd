"""Trainable on-TPU value/class/direction reader (VERDICT r3 #2).

The reference's stage-2 value pass ships every enumerated image to an
external VLM over HTTP and parses `[{id, class, value}]` back
(src/utils.py:184-285); round 3 added the PaliGemma head as the on-TPU
generalist path, but without real weights its outputs were noise. This
module makes the on-TPU value path SEMANTICALLY REAL in-session: a
small convolutional reader trained on synthetic schematics with printed
values (eval/glyphs.render_schematic) until held-out `{id, class,
value}` extraction is correct.

TPU-first decomposition: the external VLM must read red enumeration
digits off the whole image because it is a black box; the pipeline
itself DREW those digits (topology/enumerate_components), so the
id→component association is already known. The reader therefore
consumes fixed-size per-component crops — one static-shape batched
forward for a whole image's components (or a whole chunk's) — and
answers three heads per crop:

  class      — the component's taxonomy class (from its glyph)
  value      — the printed value string, as per-slot character
               classification over the ASCII value grammar
  direction  — semantic polarity (UP/DOWN/LEFT/RIGHT/NONE) from the
               +/− marks, arrow, or triangle — replacing the per-crop
               direction VLM call (src/circuit_analyzer.py:2036-2143)

Slot-classification beats an autoregressive decoder here: values are
≤8 chars from a 20-char alphabet, so the whole read is ONE forward pass
(no decode loop to ride the device-dispatch tunnel), and exact-match
accuracy is directly the product metric.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import taxonomy
from ..core.types import BBox

#: value alphabet (eval/glyphs.VALUE_GRAMMAR emits a subset; '.' and 'G'
#: future-proof the grammar). Slot 0 of the logits is the blank.
VALUE_CHARS = "0123456789kMGunmp.:-"
BLANK = 0
MAX_VALUE_LEN = 8
DIRECTIONS = ("NONE", "UP", "DOWN", "LEFT", "RIGHT")

CROP_SIZE = 96
CROP_PAD = 26  # catches the printed value text adjacent to the box


@dataclasses.dataclass(frozen=True)
class ReaderConfig:
    crop_size: int = CROP_SIZE
    num_classes: int = len(taxonomy.CLASSES)
    value_len: int = MAX_VALUE_LEN
    value_vocab: int = len(VALUE_CHARS) + 1  # + blank
    n_directions: int = len(DIRECTIONS)
    width: int = 48


def encode_value(value: Optional[str]) -> np.ndarray:
    """Value string → (MAX_VALUE_LEN,) int32 codes (0 = blank)."""
    out = np.zeros((MAX_VALUE_LEN,), np.int32)
    if not value:
        return out
    for i, ch in enumerate(value[:MAX_VALUE_LEN]):
        idx = VALUE_CHARS.find(ch)
        out[i] = idx + 1 if idx >= 0 else 0
    return out


def decode_value(codes) -> Optional[str]:
    chars = []
    for c in np.asarray(codes):
        c = int(c)
        if c == BLANK:
            break
        chars.append(VALUE_CHARS[c - 1])
    return "".join(chars) or None


class CropReader(nn.Module):
    """Small conv net over (B, S, S, 3) component crops → three heads."""

    cfg: ReaderConfig = ReaderConfig()

    @nn.compact
    def __call__(self, x: jax.Array):
        w = self.cfg.width
        for i, ch in enumerate((w, 2 * w, 4 * w, 8 * w)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.gelu(x)
            x = nn.Conv(ch, (3, 3), use_bias=False, name=f"conv{i}b")(x)
            x = nn.LayerNorm(name=f"ln{i}b")(x)
            x = nn.gelu(x)
        feat = x.mean(axis=(1, 2))  # (B, 8w)
        feat = nn.gelu(nn.Dense(8 * w, name="trunk_out")(feat))
        cls_logits = nn.Dense(self.cfg.num_classes, name="head_cls")(feat)
        val_logits = nn.Dense(
            self.cfg.value_len * self.cfg.value_vocab, name="head_val"
        )(feat).reshape(feat.shape[0], self.cfg.value_len, self.cfg.value_vocab)
        dir_logits = nn.Dense(self.cfg.n_directions, name="head_dir")(feat)
        return cls_logits, val_logits, dir_logits


def init_reader(cfg: ReaderConfig, rng) -> dict:
    model = CropReader(cfg)
    return model.init(
        rng, jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3), jnp.float32)
    )


def make_crop(image: np.ndarray, box: BBox, pad: int = CROP_PAD,
              size: int = CROP_SIZE) -> np.ndarray:
    """Component crop + context pad, resized to (size, size, 3) uint8.

    Host-side (PIL bilinear): crops are data-prep, not device compute;
    the batched forward is the device program."""
    from PIL import Image

    h, w = image.shape[:2]
    x0 = max(0, box.xmin - pad)
    y0 = max(0, box.ymin - pad)
    x1 = min(w, box.xmax + pad)
    y1 = min(h, box.ymax + pad)
    if x1 <= x0 or y1 <= y0:
        return np.full((size, size, 3), 255, np.uint8)
    crop = image[y0:y1, x0:x1]
    return np.asarray(
        Image.fromarray(crop).resize((size, size), Image.BILINEAR)
    )


def reader_loss(model: CropReader, params, crops, cls_ids, val_codes, dir_ids):
    """Cross-entropy over the three heads. dir target NONE contributes
    normally (the model must learn 'no polarity' for R/C/L)."""
    cls_logits, val_logits, dir_logits = model.apply(
        params, crops.astype(jnp.float32) / 255.0
    )

    def ce(logits, targets):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]

    cls_loss = ce(cls_logits, cls_ids).mean()
    val_loss = ce(val_logits, val_codes).mean()
    dir_loss = ce(dir_logits, dir_ids).mean()
    total = cls_loss + 2.0 * val_loss + dir_loss
    return total, {
        "loss": total, "cls_loss": cls_loss,
        "val_loss": val_loss, "dir_loss": dir_loss,
    }


def make_reader_train_step(model: CropReader, tx):
    import optax

    def step(params, opt_state, crops, cls_ids, val_codes, dir_ids):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: reader_loss(model, p, crops, cls_ids, val_codes, dir_ids),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


# ---------------------------------------------------------------------------
# dataset generation (host)
# ---------------------------------------------------------------------------

def generate_reader_dataset(n_circuits: int, seed0: int):
    """Render n_circuits random schematics with glyphs + printed values
    and cut per-component training crops.

    Returns dict of arrays: crops (N, S, S, 3) u8, cls (N,) i32,
    val (N, 8) i32, dir (N,) i32."""
    from ..eval.glyphs import render_schematic
    from ..eval.randomized import random_circuit

    crops, cls_ids, val_codes, dir_ids = [], [], [], []
    for i in range(n_circuits):
        mask, boxes = random_circuit(seed0 + i)
        rng = np.random.default_rng(seed0 + i)
        img, values, dirs, _tb = render_schematic(mask, boxes, rng)
        for b in boxes:
            if b.class_name in taxonomy.NETLIST_IGNORE_CLASSES or \
                    b.class_name == "circuit":
                continue
            crops.append(make_crop(img, b))
            cls_ids.append(taxonomy.CLASSES.get(b.class_name, 0))
            val_codes.append(encode_value(values.get(b.persistent_uid)))
            d = dirs.get(b.persistent_uid)
            dir_ids.append(DIRECTIONS.index(d) if d in DIRECTIONS else 0)
    return {
        "crops": np.stack(crops).astype(np.uint8),
        "cls": np.asarray(cls_ids, np.int32),
        "val": np.stack(val_codes).astype(np.int32),
        "dir": np.asarray(dir_ids, np.int32),
    }
