"""Model variable checkpointing (save/load) and converter entry points.

Replaces the reference's torch checkpoint loading
(src/circuit_analyzer.py:45, 226-234) with orbax-backed JAX checkpoints,
plus one-shot conversion helpers from the reference's torch files:

  python -m circuitvision_tpu.models.checkpoint convert-yolo  best.pt out/
  python -m circuitvision_tpu.models.checkpoint convert-sam2  best.pth out/
"""
from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import numpy as np


def save_variables(path: str, variables: dict) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, variables, force=True)


def load_variables(path: str, template: Optional[dict] = None) -> dict:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        restore_args = jax.tree_util.tree_map(
            lambda x: ocp.ArrayRestoreArgs(dtype=np.asarray(x).dtype), template
        )
        return ckptr.restore(path, restore_args=restore_args)
    return ckptr.restore(path)


def convert_yolo_checkpoint(torch_path: str, out_path: str, scale: str = "l",
                            num_classes: int = 62, img_size: int = 640) -> None:
    """Ultralytics .pt → orbax checkpoint of YOLOv11 Flax variables."""
    from .yolo.convert import convert_state_dict, load_ultralytics_checkpoint
    from .yolo.model import YOLOv11, init_params

    state = load_ultralytics_checkpoint(torch_path)
    model = YOLOv11(num_classes=num_classes, scale=scale)
    template = init_params(model, jax.random.PRNGKey(0), img_size=img_size)
    variables = convert_state_dict(state, template)
    save_variables(out_path, variables)


def convert_sam2_checkpoint(torch_path: str, out_path: str,
                            lora_alpha: float = 16.0) -> None:
    """Fine-tuned SAM2 .pth (PEFT + wrapper) → orbax checkpoint."""
    import torch

    from ..core.config import SAM2Config
    from .sam2.convert import convert_state_dict
    from .sam2.wrapper import SAM2ImageSegmenter, init_params

    obj = torch.load(torch_path, map_location="cpu", weights_only=False)
    state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj.state_dict()
    model = SAM2ImageSegmenter(cfg=SAM2Config())
    template = init_params(model, jax.random.PRNGKey(0))
    variables = convert_state_dict(state, template, lora_alpha=lora_alpha)
    save_variables(out_path, variables)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3 or argv[0] not in ("convert-yolo", "convert-sam2"):
        print(__doc__)
        return 1
    cmd, src, dst = argv[0], argv[1], argv[2]
    if cmd == "convert-yolo":
        convert_yolo_checkpoint(src, dst)
    else:
        convert_sam2_checkpoint(src, dst)
    print(f"converted {src} -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
