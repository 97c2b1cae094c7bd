"""PaliGemma on-TPU VLM head (BASELINE.json config 5).

SigLIP-So400m vision tower + Gemma-2B decoder in Flax with a static KV
cache and a single-dispatch greedy decode loop, an HF-checkpoint
converter, and a VLMClient-protocol value reader that slots into the
pipeline in place of the external Gemini stage-2 call
(/root/reference/src/utils.py:184-285).
"""
from .config import GemmaTextConfig, PaliGemmaConfig, SiglipVisionConfig, tiny_config
from .convert import convert_hf_state, torch_state_to_numpy
from .model import GenerateResult, PaliGemma, greedy_generate
from .quant import quantize_variables
from .reader import ByteTokenizer, PaliGemmaValueReader

__all__ = [
    "ByteTokenizer",
    "GemmaTextConfig",
    "GenerateResult",
    "PaliGemma",
    "PaliGemmaConfig",
    "PaliGemmaValueReader",
    "SiglipVisionConfig",
    "convert_hf_state",
    "greedy_generate",
    "quantize_variables",
    "tiny_config",
    "torch_state_to_numpy",
]
