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

#: reader label space: the 62 detector classes PLUS the netlist-map
#: names that are circuit classes without detector ids ("capacitor",
#: "current.dc", …) — labeling those with CLASSES.get(name, 0) silently
#: mapped them to __background__ and capped held-out class accuracy.
READER_CLASS_NAMES = tuple(
    sorted(set(taxonomy.CLASSES) | set(taxonomy.NETLIST_MAP))
)
READER_CLASS_TO_ID = {n: i for i, n in enumerate(READER_CLASS_NAMES)}

#: value/class crops are NATIVE-resolution windows centered on the box —
#: resampling a padded box to a fixed size blurred the ~8 px printed
#: values into ~5% character error, which compounds to ~25% image-level
#: netlist error. 160² covers a 72 px box plus adjacent text on any side.
CROP_SIZE = 160
CROP_PAD = 26  # context pad for the legacy resized crop (direction path)


@dataclasses.dataclass(frozen=True)
class ReaderConfig:
    crop_size: int = CROP_SIZE
    num_classes: int = len(READER_CLASS_NAMES)
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
        # inputs arrive in [0, 1]; schematic crops are ~90% white, so
        # center to [-1, 1] — without it training sits in a collapsed
        # all-white basin for hundreds of steps (measured)
        x = x * 2.0 - 1.0
        w = self.cfg.width
        for i, ch in enumerate((w, 2 * w, 4 * w, 8 * w)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.gelu(x)
            x = nn.Conv(ch, (3, 3), use_bias=False, name=f"conv{i}b")(x)
            x = nn.LayerNorm(name=f"ln{i}b")(x)
            x = nn.gelu(x)
        # GAP + a coarse spatial grid: average pooling alone erases the
        # character positions the value head needs; the 5×5 grid keeps
        # where-ink-is at low cost.
        gap = x.mean(axis=(1, 2))  # (B, 8w)
        g = nn.avg_pool(x, (2, 2), strides=(2, 2))
        grid = nn.Conv(w, (1, 1), name="grid_proj")(g).reshape(x.shape[0], -1)
        feat = jnp.concatenate([gap, grid], axis=-1)
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


def resize_crop(crop: np.ndarray, size: int) -> np.ndarray:
    """uint8 bilinear resize to (size, size): cv2 when present (~8x
    faster than PIL on the 1-core serving host — 0.07 vs 0.59 ms per
    160² crop; outputs differ by at most ±1 gray level, immaterial to
    the learned reader), PIL fallback otherwise."""
    try:
        import cv2

        return cv2.resize(
            np.asarray(crop), (size, size), interpolation=cv2.INTER_LINEAR
        )
    except Exception:  # pragma: no cover - environment fallback
        from PIL import Image

        return np.asarray(
            Image.fromarray(np.asarray(crop)).resize(
                (size, size), Image.BILINEAR
            )
        )


def make_crop(image: np.ndarray, box: BBox, pad: int = CROP_PAD,
              size: int = CROP_SIZE) -> np.ndarray:
    """Component crop + context pad, resized to (size, size, 3) uint8.

    Host-side: crops are data-prep, not device compute; the batched
    forward is the device program. Used for the direction path (the
    enrichment hands the client pre-cut crops); the value path uses the
    resampling-free `make_value_window`."""
    h, w = image.shape[:2]
    x0 = max(0, box.xmin - pad)
    y0 = max(0, box.ymin - pad)
    x1 = min(w, box.xmax + pad)
    y1 = min(h, box.ymax + pad)
    if x1 <= x0 or y1 <= y0:
        return np.full((size, size, 3), 255, np.uint8)
    return resize_crop(image[y0:y1, x0:x1], size)


def make_value_window(
    image: np.ndarray, box: BBox, size: int = CROP_SIZE,
    jitter: tuple = (0, 0),
) -> np.ndarray:
    """NATIVE-resolution (size, size) window centered on the box (plus an
    optional train-time center jitter), white-padded at image borders —
    no resampling, so the ~8 px printed value glyphs stay pixel-crisp."""
    h, w = image.shape[:2]
    cx = (box.xmin + box.xmax) // 2 + int(jitter[0])
    cy = (box.ymin + box.ymax) // 2 + int(jitter[1])
    x0, y0 = cx - size // 2, cy - size // 2
    out = np.full((size, size, 3), 255, np.uint8)
    sx0, sy0 = max(0, x0), max(0, y0)
    sx1, sy1 = min(w, x0 + size), min(h, y0 + size)
    if sx1 > sx0 and sy1 > sy0:
        out[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = image[sy0:sy1, sx0:sx1]
    return out


def reader_loss(model: CropReader, params, crops, cls_ids, val_codes, dir_ids,
                val_w=None):
    """Cross-entropy over the three heads. dir target NONE contributes
    normally (the model must learn 'no polarity' for R/C/L). val_w
    (optional (B,) weights) masks the value loss for crops whose value
    text is out of frame (the serving-geometry direction crops)."""
    cls_logits, val_logits, dir_logits = model.apply(
        params, crops.astype(jnp.float32) / 255.0
    )

    def ce(logits, targets):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]

    cls_loss = ce(cls_logits, cls_ids).mean()
    val_ce = ce(val_logits, val_codes).mean(axis=-1)  # (B,)
    if val_w is None:
        val_loss = val_ce.mean()
    else:
        val_loss = (val_ce * val_w).sum() / jnp.maximum(val_w.sum(), 1.0)
    dir_loss = ce(dir_logits, dir_ids).mean()
    total = cls_loss + 2.0 * val_loss + dir_loss
    return total, {
        "loss": total, "cls_loss": cls_loss,
        "val_loss": val_loss, "dir_loss": dir_loss,
    }


def make_reader_train_step(model: CropReader, tx):
    import optax

    def step(params, opt_state, crops, cls_ids, val_codes, dir_ids,
             val_w=None):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: reader_loss(
                model, p, crops, cls_ids, val_codes, dir_ids, val_w
            ),
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

    Two crop geometries per directional component: the value crop
    (CROP_PAD context, all heads) and a serving-geometry direction crop
    (pad 15, the reference's VLM crop pad, src/circuit_analyzer.py:2176)
    whose value loss is masked (the printed value may be out of frame).

    Returns dict of arrays: crops (N, S, S, 3) u8, cls (N,) i32,
    val (N, 8) i32, dir (N,) i32, val_w (N,) f32."""
    from ..eval.glyphs import render_schematic
    from ..eval.randomized import random_circuit

    crops, cls_ids, val_codes, dir_ids, val_w = [], [], [], [], []
    unk = READER_CLASS_TO_ID.get("unknown", 0)
    for i in range(n_circuits):
        mask, boxes = random_circuit(seed0 + i)
        rng = np.random.default_rng(seed0 + i)
        img, values, dirs, _tb = render_schematic(mask, boxes, rng)
        for b in boxes:
            if b.class_name in taxonomy.NETLIST_IGNORE_CLASSES or \
                    b.class_name == "circuit":
                continue
            d = dirs.get(b.persistent_uid)
            d_id = DIRECTIONS.index(d) if d in DIRECTIONS else 0
            cid = READER_CLASS_TO_ID.get(b.class_name, unk)
            vcode = encode_value(values.get(b.persistent_uid))
            # two jittered native windows per component: the serving
            # window is exact-centered; jitter teaches invariance to it
            for jitter in ((0, 0),
                           tuple(rng.integers(-8, 9, size=2))):
                crops.append(make_value_window(img, b, jitter=jitter))
                cls_ids.append(cid)
                val_codes.append(vcode)
                dir_ids.append(d_id)
                val_w.append(1.0)
            if d_id != 0:
                crops.append(make_crop(img, b, pad=15))
                cls_ids.append(cid)
                val_codes.append(encode_value(None))
                dir_ids.append(d_id)
                val_w.append(0.0)
    return {
        "crops": np.stack(crops).astype(np.uint8),
        "cls": np.asarray(cls_ids, np.int32),
        "val": np.stack(val_codes).astype(np.int32),
        "dir": np.asarray(dir_ids, np.int32),
        "val_w": np.asarray(val_w, np.float32),
    }
