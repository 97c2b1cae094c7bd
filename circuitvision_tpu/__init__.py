"""circuitvision_tpu — TPU-native circuit-image → SPICE-netlist framework.

A ground-up JAX/XLA/Pallas rebuild of the CircuitVision pipeline
(reference: JKc66/CircuitVision): YOLOv11 component detection, cluster
crop, prompt-free SAM 2.1 wire segmentation, mask topology analysis,
netlist generation, VLM enrichment, and DC/AC SPICE simulation.
"""
__version__ = "0.1.0"

from .core import taxonomy  # noqa: F401
from .core.config import PipelineConfig  # noqa: F401
from .core.types import AnalysisResult, BBox, NetlistLine, Node  # noqa: F401
from .netlist.fix import fix_netlist  # noqa: F401
from .netlist.generate import (  # noqa: F401
    generate_fallback_netlist,
    generate_netlist_from_nodes,
    stringify_netlist,
)
from .netlist.values import (  # noqa: F401
    detect_analysis_mode,
    parse_ac_string,
    parse_component_value,
    preprocess_netlist_for_dc,
    rewrite_value_for_ac,
)
