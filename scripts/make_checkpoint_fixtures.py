"""Freeze the real checkpoint key inventories as on-disk fixtures
(VERDICT r3 #7).

Writes tests/fixtures/{sam2_l,yolo_l}_reference_checkpoint_keys.json:
the complete key→shape inventory of
  - the PEFT-wrapped fine-tuned SAM2 checkpoint
    (best_miou_model_SAM_latest.pth layout, src/circuit_analyzer.py:203-233,
    all 36 LoRA targets at the real Hiera-L indices), and
  - the ultralytics YOLOv11-L state_dict (best_large_model_yolo.pt).

tests/test_checkpoint_conversion.py asserts the converters consume every
fixture key (or explain the skip) and that the inventory the CURRENT
code would expect equals the frozen one — so converter drift that would
silently drop a real checkpoint key fails a test instead of corrupting
a load.

Regenerate (only when the model architecture legitimately changes):
    python scripts/make_checkpoint_fixtures.py
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures")


def main():
    from circuitvision_tpu.core.config import DetectorConfig, SAM2Config
    from circuitvision_tpu.models.sam2 import convert as sam2_convert
    from circuitvision_tpu.models.sam2.wrapper import (
        SAM2ImageSegmenter,
        init_params as sam2_init,
    )
    from circuitvision_tpu.models.yolo import convert as yolo_convert
    from circuitvision_tpu.models.yolo.model import (
        YOLOv11,
        init_params as yolo_init,
    )

    os.makedirs(FIXTURE_DIR, exist_ok=True)

    sam_cfg = SAM2Config()  # full Hiera-L defaults
    sam = SAM2ImageSegmenter(cfg=sam_cfg)
    sam_vars = sam2_init(sam, jax.random.PRNGKey(0))
    sam_inv = sam2_convert.reference_checkpoint_inventory(sam_vars)
    path = os.path.join(FIXTURE_DIR, "sam2_l_reference_checkpoint_keys.json")
    with open(path, "w") as f:
        json.dump({k: list(v) for k, v in sorted(sam_inv.items())}, f, indent=0)
    n_lora = sum(1 for k in sam_inv if ".lora_A." in k)
    print(f"{path}: {len(sam_inv)} keys, {n_lora} LoRA-A entries")
    assert n_lora == len(sam2_convert.REFERENCE_LORA_TARGETS) == 36

    det_cfg = DetectorConfig(scale="l", img_size=640)
    yolo = YOLOv11(
        num_classes=det_cfg.num_classes, scale=det_cfg.scale,
        reg_max=det_cfg.reg_max,
    )
    yolo_vars = yolo_init(yolo, jax.random.PRNGKey(1), img_size=det_cfg.img_size)
    yolo_inv = yolo_convert.reference_checkpoint_inventory(yolo_vars)
    path = os.path.join(FIXTURE_DIR, "yolo_l_reference_checkpoint_keys.json")
    with open(path, "w") as f:
        json.dump({k: list(v) for k, v in sorted(yolo_inv.items())}, f, indent=0)
    print(f"{path}: {len(yolo_inv)} keys")


if __name__ == "__main__":
    main()
