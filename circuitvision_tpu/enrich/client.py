"""VLM client protocol + Gemini/OpenRouter implementations + fakes.

The reference binds its two VLM uses to concrete HTTP clients
(gemini_labels_openrouter src/utils.py:184-285; direction calls
src/circuit_analyzer.py:2036-2143). Here both sit behind a Protocol so
tests inject deterministic fakes and the structural pipeline stays
fully offline (SURVEY.md §4 item 4, §7 "hard parts" item 6).
"""
from __future__ import annotations

import ast
import json
import logging
import os
from typing import Optional, Protocol, Sequence

import numpy as np

from .prompts import DIODE_DIRECTION_PROMPT, LABELS_PROMPT, VOLTAGE_DIRECTION_PROMPT

logger = logging.getLogger(__name__)


class VLMClient(Protocol):
    """Vision-language model interface used by the pipeline."""

    def get_labels(self, enum_image_rgb: np.ndarray) -> list[dict]:
        """Stage-2 extraction: enumerated image → [{'id','class','value'}]."""
        ...

    def get_direction(
        self, crop_rgb: np.ndarray, component_class: str
    ) -> tuple[str, str]:
        """Per-component polarity: crop → (direction, reason), each one of
        UP/DOWN/LEFT/RIGHT/UNKNOWN and SIGN/ARROW/UNKNOWN."""
        ...


def parse_vlm_list(text: str) -> list[dict]:
    """Fence-stripping + dual ast/json parser (src/utils.py:249-282).

    str.strip takes a CHARACTER SET, so these strips eat any mix of the
    fence characters at both ends — including, in the second strip, a
    literal backslash: the reference source reads strip('```json\\\\n')
    (backslash + n, not a newline). Reproduced byte-for-byte; pinned
    against the reference's own parser in
    tests/test_reference_diff.py::TestVLMResponseParserMatchesReference.
    """
    formatted = text.strip("```python\n")
    formatted = formatted.strip("```json\\n")
    formatted = formatted.strip("```")
    try:
        return ast.literal_eval(formatted.replace("null", "None"))
    except (SyntaxError, ValueError) as e_ast:
        try:
            return json.loads(formatted)
        except json.JSONDecodeError as e_json:
            raise ValueError(
                f"Failed to parse VLM response. ast error: {e_ast}, json error: "
                f"{e_json}. Formatted response: {formatted}"
            )


def parse_gemini_labels(text: str) -> list[dict]:
    """The DIRECT-Gemini path's parse (gemini_labels, src/utils.py:160-180):
    json-FIRST with a null→None ast fallback, and a REAL newline in the
    json strip set — the openrouter path above parses ast-first and its
    second strip carries a literal backslash (line 251 vs 162). Pinned
    against the reference's own function in
    tests/test_reference_diff.py::TestGeminiLabelsMatchesReference."""
    formatted = text.strip("```python\n")
    formatted = formatted.strip("```json\n")
    formatted = formatted.strip("```")
    try:
        return json.loads(formatted)
    except json.JSONDecodeError:
        try:
            return ast.literal_eval(formatted.replace("null", "None"))
        except Exception as e2:
            raise ValueError(
                f"Failed to parse Gemini response: {e2}. "
                f"Original response: {formatted}"
            )


class FakeVLMClient:
    """Deterministic offline client for tests and air-gapped runs.

    labels: canned stage-2 output (list of dicts) or None → empty list.
    directions: {component_class: (direction, reason)} with a default.
    """

    def __init__(
        self,
        labels: Optional[Sequence[dict]] = None,
        directions: Optional[dict] = None,
        default_direction: tuple[str, str] = ("UNKNOWN", "UNKNOWN"),
    ):
        self.labels = list(labels) if labels else []
        self.directions = dict(directions or {})
        self.default_direction = default_direction
        self.label_calls = 0
        self.direction_calls: list[str] = []

    def get_labels(self, enum_image_rgb: np.ndarray) -> list[dict]:
        self.label_calls += 1
        return list(self.labels)

    def get_labels_batch(self, enum_images_rgb) -> list[Optional[list[dict]]]:
        """Batched stage-2 (optional protocol extension — the on-TPU
        reader implements it as one device dispatch; HTTP clients omit it
        and the pipeline falls back to per-image calls)."""
        self.label_batch_calls = getattr(self, "label_batch_calls", 0) + 1
        return [list(self.labels) for _ in enum_images_rgb]

    def get_direction(self, crop_rgb: np.ndarray, component_class: str):
        self.direction_calls.append(component_class)
        return self.directions.get(component_class, self.default_direction)


class GeminiVLMClient:
    """Direct Gemini API client (reference gemini_labels path,
    src/utils.py:125-182 and direction path src/circuit_analyzer.py:2103-2143).
    Requires GEMINI_API_KEY; constructed lazily."""

    def __init__(
        self,
        api_key: Optional[str] = None,
        labels_model: str = "gemini-2.5-pro-exp-03-25",
        direction_model: str = "gemini-2.5-flash-lite-preview-06-17",
        temperature: float = 0.1,
        top_p: float = 0.98,
        max_output_tokens: int = 1024,
    ):
        self.api_key = api_key or os.getenv("GEMINI_API_KEY")
        if not self.api_key:
            raise ValueError("GEMINI_API_KEY not set")
        from google import genai  # deferred: optional dependency

        self._genai = genai
        self.client = genai.Client(api_key=self.api_key)
        self.labels_model = labels_model
        self.direction_model = direction_model
        # Direction-call generation params (reference defaults,
        # src/circuit_analyzer.py:2112-2121); the labels call keeps the
        # reference's fixed temperature 0 (src/utils.py:158).
        self.temperature = temperature
        self.top_p = top_p
        self.max_output_tokens = max_output_tokens

    def get_labels(self, enum_image_rgb: np.ndarray) -> list[dict]:
        from PIL import Image

        img = Image.fromarray(enum_image_rgb)
        response = self.client.models.generate_content(
            model=self.labels_model,
            contents=[img, "\n", LABELS_PROMPT],
            config={"temperature": 0},
        )
        return parse_gemini_labels(response.text)

    def get_direction(self, crop_rgb: np.ndarray, component_class: str):
        from ..core import taxonomy

        if component_class in taxonomy.VOLTAGE_CLASSES:
            prompt = VOLTAGE_DIRECTION_PROMPT
        elif component_class in taxonomy.DIODE_CLASSES:
            prompt = DIODE_DIRECTION_PROMPT
        else:
            return "UNKNOWN", "UNKNOWN"
        from PIL import Image

        try:
            response = self.client.models.generate_content(
                model=self.direction_model,
                contents=[prompt, Image.fromarray(crop_rgb)],
                config={
                    "response_mime_type": "application/json",
                    "temperature": self.temperature,
                    "top_p": self.top_p,
                    "max_output_tokens": self.max_output_tokens,
                },
            )
            parsed = json.loads(response.text)
            direction = parsed.get("direction")
            reason = parsed.get("reason")
            if direction:
                return str(direction).upper(), str(reason).upper() if reason else "UNKNOWN"
            return "UNKNOWN", "UNKNOWN"
        except Exception:
            return "UNKNOWN", "UNKNOWN"


class OpenRouterVLMClient:
    """OpenRouter (OpenAI SDK) labels client — the reference's production
    stage-2 path (src/utils.py:184-285)."""

    def __init__(
        self,
        api_key: Optional[str] = None,
        model: str = "google/gemini-2.5-flash-preview",
    ):
        self.api_key = api_key or os.getenv("OPENROUTER_API_KEY")
        if not self.api_key:
            raise ValueError("OPENROUTER_API_KEY not set")
        import openai  # deferred

        self.client = openai.OpenAI(
            base_url="https://openrouter.ai/api/v1", api_key=self.api_key
        )
        self.model = model

    def get_labels(self, enum_image_rgb: np.ndarray) -> list[dict]:
        import base64
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(enum_image_rgb).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode("utf-8")
        response = self.client.chat.completions.create(
            model=self.model,
            messages=[
                {
                    "role": "user",
                    "content": [
                        {"type": "text", "text": LABELS_PROMPT},
                        {
                            "type": "image_url",
                            "image_url": {"url": f"data:image/png;base64,{b64}"},
                        },
                    ],
                }
            ],
            temperature=0,
        )
        if not response.choices:
            raise ValueError("VLM response contained no choices")
        return parse_vlm_list(response.choices[0].message.content)

    def get_direction(self, crop_rgb: np.ndarray, component_class: str):
        return "UNKNOWN", "UNKNOWN"  # direction uses the Gemini client


def default_client(enrich=None) -> Optional[VLMClient]:
    """Pick a client from the environment; None when no keys configured
    (the pipeline then degrades exactly like the reference with no
    GEMINI_API_KEY, src/circuit_analyzer.py:133-147).

    `enrich` (core.config.EnrichConfig) supplies the HTTP clients'
    models and the direction-call generation params; None keeps the
    reference defaults.

    CIRCUITVISION_VLM=paligemma:<orbax_ckpt_dir> selects the on-device
    PaliGemma head (models/paligemma) instead of an HTTP client —
    weights converted via
    `python -m circuitvision_tpu.models.checkpoint convert-paligemma`.
    A trailing ':int8' (paligemma:<dir>:int8) quantizes the decode path
    weight-only at load (models/paligemma/quant.py) — ~half the per-step
    HBM parameter read.

    CIRCUITVISION_VLM=reader:<orbax_ckpt_dir> selects the in-repo
    TRAINED crop reader (train/reader.py via enrich/trained_reader.py) —
    box-driven value/class/direction reads in one batched forward per
    chunk; train with scripts/train_reader_demo.py --out <dir>."""
    spec = os.getenv("CIRCUITVISION_VLM", "")
    if spec.startswith("reader:"):
        # the in-repo trained crop reader (train/reader.py) — box-driven,
        # one static-shape forward per chunk; checkpoint from
        # scripts/train_reader_demo.py --out
        try:
            from .trained_reader import load_trained_reader

            return load_trained_reader(spec.split(":", 1)[1])
        except Exception:
            logger.exception("CIRCUITVISION_VLM=%s failed; falling back", spec)
    if spec.startswith("paligemma:"):
        try:
            import dataclasses

            from ..models.checkpoint import load_variables
            from ..models.paligemma import PaliGemmaConfig, PaliGemmaValueReader

            rest = spec.split(":", 1)[1]
            quant = rest.endswith(":int8")
            ckpt = rest[: -len(":int8")] if quant else rest
            cfg = PaliGemmaConfig()
            variables = load_variables(ckpt)
            if quant:
                from ..models.paligemma import quantize_variables

                cfg = dataclasses.replace(
                    cfg, text=dataclasses.replace(cfg.text, quant_int8=True)
                )
                variables = quantize_variables(variables)
            return PaliGemmaValueReader(cfg=cfg, variables=variables)
        except Exception:
            logger.exception("CIRCUITVISION_VLM=%s failed; falling back", spec)
    if os.getenv("GEMINI_API_KEY"):
        try:
            if enrich is not None:
                return GeminiVLMClient(
                    direction_model=enrich.direction_model,
                    temperature=enrich.temperature,
                    top_p=enrich.top_p,
                    max_output_tokens=enrich.max_output_tokens,
                )
            return GeminiVLMClient()
        except Exception:
            pass
    if os.getenv("OPENROUTER_API_KEY"):
        try:
            if enrich is not None:
                return OpenRouterVLMClient(model=enrich.labels_model)
            return OpenRouterVLMClient()
        except Exception:
            pass
    return None
