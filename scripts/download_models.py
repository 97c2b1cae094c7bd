"""Fetch + convert the reference checkpoints.

Equivalent of the reference's download_models.py (download_models.py:6-66):
fetches the fine-tuned YOLO and SAM2 weights plus the SAM2.1 base
checkpoint, then converts them to orbax checkpoints for this framework.

Run in an environment with network access:

    python scripts/download_models.py --out models/

Sources (from the reference downloader):
  - fine-tuned SAM2:  Google Drive id 1p2rTDyNByMhA4xDqDxYAyhfZLNA1LBzV
                      → models/SAM2/best_miou_model_SAM_latest.pth
  - base SAM2.1-L:    https://dl.fbaipublicfiles.com/segment_anything_2/092824/sam2.1_hiera_large.pt
  - YOLO fine-tune:   Google Drive id 1ZYYGPvLChiSUNPMAOOU1MgBgFpjrXCRC
                      → models/YOLO/best_large_model_yolo.pt

After download this script converts both into framework checkpoints:
  models/jax/yolo/   (orbax)
  models/jax/sam2/   (orbax, LoRA folded)
"""
from __future__ import annotations

import argparse
import os
import sys
import urllib.request

SAM2_BASE_URL = (
    "https://dl.fbaipublicfiles.com/segment_anything_2/092824/sam2.1_hiera_large.pt"
)
SAM2_FINETUNE_GDRIVE = "1p2rTDyNByMhA4xDqDxYAyhfZLNA1LBzV"
YOLO_GDRIVE = "1ZYYGPvLChiSUNPMAOOU1MgBgFpjrXCRC"


def _download(url: str, dest: str) -> None:
    if os.path.exists(dest):
        print(f"exists: {dest}")
        return
    print(f"downloading {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)


def _gdrive(file_id: str, dest: str) -> None:
    if os.path.exists(dest):
        print(f"exists: {dest}")
        return
    try:
        import gdown  # optional

        gdown.download(id=file_id, output=dest, quiet=False)
    except ImportError:
        url = f"https://drive.google.com/uc?export=download&id={file_id}"
        print(f"gdown not installed; trying direct fetch {url}")
        _download(url, dest)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="models")
    parser.add_argument("--skip-convert", action="store_true")
    args = parser.parse_args()

    sam_dir = os.path.join(args.out, "SAM2")
    yolo_dir = os.path.join(args.out, "YOLO")
    jax_dir = os.path.join(args.out, "jax")
    for d in (sam_dir, yolo_dir, jax_dir):
        os.makedirs(d, exist_ok=True)

    base_pt = os.path.join(sam_dir, "sam2.1_hiera_large.pt")
    finetune_pth = os.path.join(sam_dir, "best_miou_model_SAM_latest.pth")
    yolo_pt = os.path.join(yolo_dir, "best_large_model_yolo.pt")

    _download(SAM2_BASE_URL, base_pt)
    _gdrive(SAM2_FINETUNE_GDRIVE, finetune_pth)
    _gdrive(YOLO_GDRIVE, yolo_pt)

    if args.skip_convert:
        return 0

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from circuitvision_tpu.models.checkpoint import (
        convert_sam2_checkpoint,
        convert_yolo_checkpoint,
    )

    convert_yolo_checkpoint(yolo_pt, os.path.join(jax_dir, "yolo"))
    convert_sam2_checkpoint(finetune_pth, os.path.join(jax_dir, "sam2"))
    print("conversion complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
