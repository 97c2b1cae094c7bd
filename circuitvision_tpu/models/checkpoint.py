"""Model variable checkpointing (save/load) and converter entry points.

Replaces the reference's torch checkpoint loading
(src/circuit_analyzer.py:45, 226-234) with orbax-backed JAX checkpoints,
plus one-shot conversion helpers from the reference's torch files:

  python -m circuitvision_tpu.models.checkpoint convert-yolo      best.pt out/
      [--scale n|s|m|l|x] [--num-classes N] [--img-size S]
  python -m circuitvision_tpu.models.checkpoint convert-sam2      best.pth out/
      [--lora-alpha A]
  python -m circuitvision_tpu.models.checkpoint convert-paligemma hf_dir_or_file out/
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
    try:
        return ckptr.restore(path)
    except ValueError:
        # A checkpoint written on a different topology (e.g. saved on
        # the TPU, restored under the 8-virtual-CPU test mesh) cannot
        # infer shardings; restore as host numpy — weights are placed
        # by the consumer anyway.
        item_md = ckptr.metadata(path).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item_md
        )
        return ckptr.restore(path, restore_args=restore_args)


def save_model_checkpoint(path: str, variables: dict, meta: dict) -> None:
    """Variables + a meta.json sidecar describing the model config.

    Layout: <path>/variables (orbax tree) + <path>/meta.json. The meta
    carries whatever the producing trainer wants consumers to know —
    e.g. {"kind": "yolo", "detector": {...DetectorConfig fields...}} —
    so eval/serving can reconstruct the right architecture without
    out-of-band flags (the reference bakes this into hard-coded model
    paths + a Hydra yaml, src/circuit_analyzer.py:39-44, 203-223)."""
    import json

    os.makedirs(path, exist_ok=True)
    save_variables(os.path.join(path, "variables"), variables)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_model_checkpoint(path: str) -> tuple[dict, dict]:
    """Load (variables, meta) from save_model_checkpoint's layout; also
    accepts a bare orbax dir (meta = {}) for pre-sidecar checkpoints
    like ckpt/reader."""
    import json

    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    var_path = os.path.join(path, "variables")
    if not os.path.isdir(var_path):
        var_path = path
    return load_variables(var_path), meta


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


def convert_paligemma_checkpoint(torch_path: str, out_path: str,
                                 cfg=None) -> None:
    """HF PaliGemma checkpoint (dir with safetensors/bin shards, or one
    torch file) → orbax checkpoint of Flax variables (full 3B config).

    Tiny-config conversion parity vs the official HF implementation is
    pinned by tests/test_paligemma.py; this entry point is the same
    convert_hf_state on the real weights."""
    from .paligemma.config import PaliGemmaConfig
    from .paligemma.convert import convert_hf_state

    state: dict = {}
    if os.path.isdir(torch_path):
        names = sorted(os.listdir(torch_path))
        shards = [n for n in names if n.endswith(".safetensors")]
        if shards:
            from safetensors import safe_open

            for shard in shards:
                with safe_open(
                    os.path.join(torch_path, shard), framework="np"
                ) as f:
                    for k in f.keys():
                        state[k] = f.get_tensor(k)
        else:
            import torch

            # weight shards only — HF fine-tune dirs also hold
            # training_args.bin etc., which are not state dicts
            shards = [
                n for n in names
                if n.endswith(".bin")
                and (n.startswith("pytorch_model") or n.startswith("model"))
            ]
            for n in shards:
                state.update(
                    torch.load(
                        os.path.join(torch_path, n), map_location="cpu",
                        weights_only=False,
                    )
                )
    else:
        import torch

        obj = torch.load(torch_path, map_location="cpu", weights_only=False)
        state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj.state_dict()
    if not state:
        raise FileNotFoundError(f"no checkpoint tensors found at {torch_path}")
    variables = convert_hf_state(state, cfg or PaliGemmaConfig())
    save_variables(out_path, variables)


#: --flag → (converter kwarg, parser) per command; every documented
#: converter kwarg is reachable from the CLI.
_CLI_FLAGS = {
    "convert-yolo": {
        "--scale": ("scale", str),
        "--num-classes": ("num_classes", int),
        "--img-size": ("img_size", int),
    },
    "convert-sam2": {"--lora-alpha": ("lora_alpha", float)},
    "convert-paligemma": {},
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    commands = {
        "convert-yolo": convert_yolo_checkpoint,
        "convert-sam2": convert_sam2_checkpoint,
        "convert-paligemma": convert_paligemma_checkpoint,
    }
    if len(argv) < 3 or argv[0] not in commands:
        print(__doc__)
        return 1
    cmd, src, dst = argv[0], argv[1], argv[2]
    flags = _CLI_FLAGS[cmd]
    kwargs = {}
    rest = argv[3:]
    while rest:
        flag = rest[0]
        if flag not in flags or len(rest) < 2:
            known = " ".join(sorted(flags)) or "(none)"
            print(f"unknown argument {flag!r} for {cmd}; flags: {known}")
            return 1
        name, parse = flags[flag]
        kwargs[name] = parse(rest[1])
        rest = rest[2:]
    commands[cmd](src, dst, **kwargs)
    print(f"converted {src} -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
