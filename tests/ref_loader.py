"""In-process loader for the reference implementation's HOST logic.

The reference (/root/reference) is import-executable in this environment
once its unavailable heavy deps are stubbed: cv2, torch, numpy, PIL and
matplotlib are real; ultralytics/sam2/peft/streamlit/openai/google-genai/
dotenv/torchvision are absent and get empty module stubs (none of the
host methods under differential test touch them at call time).

`load_reference_analyzer()` returns a `CircuitAnalyzer` built via
`__new__` (skipping `__init__`, which would load YOLO/SAM2 weights) with
every attribute its host methods read populated exactly as the real
constructor would (src/circuit_analyzer.py:46-131): class-set filtering,
`netlist_map`, source/voltage/diode/current class sets.

Used by tests/test_reference_diff.py — the SURVEY §7.5 acceptance
criterion ("bit-for-bit parity with the reference netlist text") proven
against the reference's own code rather than self-pinned goldens.
"""
from __future__ import annotations

import json
import os
import sys
import types

REF_ROOT = "/root/reference"


def _ensure_module(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _FakeYOLO:
    def __init__(self, *a, **kw):
        self.model = types.SimpleNamespace(names={})

    def predict(self, *a, **kw):  # pragma: no cover - never called in tests
        raise RuntimeError("stub YOLO cannot predict")


def _noop(*a, **kw):
    return None


def _module_getattr(name: str):
    """PEP 562 catch-all for stub modules: any plain attribute resolves to
    a no-op, but dunders (``__file__``, ``__path__``, …) must raise so
    stdlib introspection (inspect/warnings) treats the stub normally."""
    if name.startswith("__") and name.endswith("__"):
        raise AttributeError(name)
    return _noop


def install_stubs() -> None:
    """Register import stubs for the reference's unavailable dependencies."""
    _ensure_module("ultralytics", YOLO=_FakeYOLO)
    _ensure_module("dotenv", load_dotenv=_noop)

    st = _ensure_module("streamlit")
    # PEP 562 module __getattr__: any attribute resolves to a no-op.
    st.__getattr__ = _module_getattr  # type: ignore[attr-defined]

    _ensure_module("openai")

    google = _ensure_module("google")
    genai = _ensure_module("google.genai", Client=_noop)
    genai_types = _ensure_module("google.genai.types")
    genai_types.__getattr__ = _module_getattr  # type: ignore[attr-defined]
    genai.types = genai_types
    google.genai = genai

    _ensure_module(
        "peft",
        LoraConfig=object,
        get_peft_model=_noop,
        TaskType=types.SimpleNamespace(FEATURE_EXTRACTION="FEATURE_EXTRACTION"),
        PeftModel=object,
    )

    sam2 = _ensure_module("sam2")
    sam2.build_sam = _ensure_module("sam2.build_sam", build_sam2=_noop)
    sam2.sam2_image_predictor = _ensure_module(
        "sam2.sam2_image_predictor", SAM2ImagePredictor=object
    )
    modeling = _ensure_module("sam2.modeling")
    modeling.sam2_base = _ensure_module("sam2.modeling.sam2_base", SAM2Base=object)
    sam2.modeling = modeling
    utils = _ensure_module("sam2.utils")
    utils.transforms = _ensure_module("sam2.utils.transforms")
    utils.misc = _ensure_module("sam2.utils.misc", get_connected_components=_noop)
    sam2.utils = utils

    tv = _ensure_module("torchvision")
    tv.transforms = _ensure_module(
        "torchvision.transforms", Normalize=object, Resize=object, ToTensor=object
    )


def load_reference_analyzer():
    """Import the reference CircuitAnalyzer and hand-build an instance with
    the host-method attribute surface of src/circuit_analyzer.py:46-131."""
    install_stubs()
    os.environ.pop("GEMINI_API_KEY", None)
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from src.circuit_analyzer import CircuitAnalyzer  # noqa: import after stubs

    a = CircuitAnalyzer.__new__(CircuitAnalyzer)
    # debug=True matches production (app.py:143) and is REQUIRED: with
    # debug=False, get_node_connections hits an UnboundLocalError on
    # `problematic_terminal_uid` (only assigned under debug, read
    # unconditionally at src/circuit_analyzer.py:1330). The matplotlib
    # show_image probe is stubbed out; debug also prints, which pytest
    # captures.
    a.debug = True
    a.last_vlm_input_images = {}
    a.show_image = _noop

    with open(os.path.join(REF_ROOT, "classes.json")) as f:
        classes = json.load(f)
    # reclassify_terminals_based_on_connectivity reads
    # self.yolo.model.names to find voltage.dc's numeric id
    # (src/circuit_analyzer.py:2264-2269); the real mapping comes from the
    # trained checkpoint, whose ids follow classes.json order (the same
    # enumeration core/taxonomy.py uses).
    a.yolo = _FakeYOLO()
    a.yolo.model.names = {i: name for i, name in enumerate(classes.keys())}
    # Constructor filtering, verbatim semantics (:49-64).
    a.classes_names = set(classes.keys())
    a.non_components = set(
        ["text", "junction", "crossover", "vss", "explanatory", "circuit"]
    )
    a.source_components = set(
        ["voltage.ac", "voltage.dc", "voltage.dependent", "current.dc",
         "current.dependent"]
    )
    reducing = set(
        ["operational_amplifier.schmitt_trigger", "integrated_circuit.ne555",
         "resistor.photo", "diode.thyrector"]
    )
    deleting = set(
        ["optical", "__background__", "inductor.coupled", "mechanical",
         "block", "magnetic"]
    )
    unknown = set(
        ["relay", "antenna", "diac", "triac", "crystal", "antenna", "probe",
         "probe.current", "probe.voltage", "optocoupler", "socket", "fuse",
         "speaker", "motor", "lamp", "microphone", "transistor.photo",
         "xor", "and", "or", "not", "nand", "nor"]
    )
    a.classes_names = a.classes_names - deleting - unknown - reducing
    filtered = {k: v for k, v in classes.items() if k in a.classes_names}
    a.classes = {key: i for i, key in enumerate(filtered.keys())}

    a.project_classes = set(
        ["gnd", "voltage.ac", "voltage.dc", "resistor", "voltage.dependent",
         "current.dc", "current.dependent", "capacitor", "inductor", "diode"]
    )
    # netlist_map verbatim (:66-102).
    a.netlist_map = {
        "resistor": "R", "resistor.adjustable": "R",
        "capacitor": "C", "capacitor.unpolarized": "C",
        "capacitor.polarized": "C", "capacitor.adjustable": "C",
        "inductor": "L", "inductor.ferrite": "L",
        "diode": "D", "diode.light_emitting": "D", "diode.zener": "D",
        "transistor.bjt": "Q", "transistor.fet": "M",
        "voltage.ac": "V", "voltage.dc": "V", "voltage.battery": "V",
        "voltage.dependent": "E",
        "current.dc": "I", "current.ac": "I", "current.dependent": "G",
        "vss": "GND", "gnd": "0",
        "switch": "S",
        "integrated_circuit": "X", "integrated_circuit.voltage_regulator": "X",
        "operational_amplifier": "X",
        "thyristor": "Q", "transformer": "T", "varistor": "RV",
        "terminal": "N",
        "junction": "", "crossover": "", "explanatory": "", "text": "",
        "unknown": "UN",
    }

    a.use_sam2 = False
    a.sam2_model = None
    a.sam2_transforms = None
    a.sam2_device = None
    a.last_sam2_output = None

    a.yolo_class_names_map = {}
    a.llama_classes_of_interest_names = {
        "voltage.dc", "voltage.ac", "diode", "diode.light_emitting",
        "diode.zener", "transistor.bjt", "unknown",
    }
    a.llama_numeric_classes_of_interest = set()
    a.voltage_classes_names = {"voltage.dc", "voltage.ac", "transistor.bjt", "unknown"}
    a.diode_classes_names = {"diode", "diode.light_emitting", "diode.zener"}
    a.current_source_classes_names = {"current.dc", "current.dependent"}
    a.gemini_client = None
    return a


def bbox_to_ref_dict(b) -> dict:
    """circuitvision_tpu BBox → the reference's detection dict shape
    (src/circuit_analyzer.py:270-287 + enrichment fields)."""
    return {
        "class": b.class_name,
        "confidence": float(b.confidence),
        "xmin": int(b.xmin),
        "ymin": int(b.ymin),
        "xmax": int(b.xmax),
        "ymax": int(b.ymax),
        "persistent_uid": b.persistent_uid,
        # Pass None through verbatim: the reference's enrichment stage
        # stores None for ineligible classes (:2213-2215) and downstream
        # .get(..., 'UNKNOWN') then sees the None, not the default.
        "semantic_direction": b.semantic_direction,
        "semantic_reason": b.semantic_reason,
    }
