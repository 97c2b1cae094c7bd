"""Command-line interface.

    python -m circuitvision_tpu.cli analyze circuit.png --netlist out.cir
    python -m circuitvision_tpu.cli analyze circuit.png --simulate dc
    python -m circuitvision_tpu.cli analyze circuit.png --simulate ac --frequency 60
    python -m circuitvision_tpu.cli simulate netlist.cir
    python -m circuitvision_tpu.cli bench --smoke

The library-level capability surface of the reference's Streamlit app
(app.py) without the UI: detection, segmentation, topology, netlist,
VLM enrichment (when API keys are configured), and DC/AC simulation.
"""
from __future__ import annotations

import argparse
import json
import sys


def _cmd_analyze(args) -> int:
    import numpy as np

    from .core.config import DetectorConfig, PipelineConfig
    from .io.image_io import load_image
    from .models.checkpoint import load_variables
    from .pipeline.analyzer import CircuitAnalyzerTPU

    image = load_image(args.image)
    yolo_vars = load_variables(args.yolo_checkpoint) if args.yolo_checkpoint else None
    sam_vars = load_variables(args.sam2_checkpoint) if args.sam2_checkpoint else None

    cfg = PipelineConfig(
        detector=DetectorConfig(scale=args.scale),
        use_sam2=sam_vars is not None or args.force_sam2,
    )
    analyzer = CircuitAnalyzerTPU(
        config=cfg,
        yolo_variables=yolo_vars,
        sam2_variables=sam_vars,
        use_sam2=cfg.use_sam2,
    )
    result = analyzer.analyze(image)

    if args.final:
        result = analyzer.generate_final_netlist(result)

    print("=== detections ===")
    for b in result.bboxes_orig_nms:
        print(f"  {b.class_name:28s} conf={b.confidence:.2f} "
              f"[{b.xmin},{b.ymin},{b.xmax},{b.ymax}]")
    print(f"=== nodes: {len(result.nodes)} ===")
    print("=== netlist ===")
    print(result.netlist_text or "(empty)")
    print("=== timings ===")
    for stage, sec in result.timings.timings.items():
        print(f"  {stage:42s} {sec*1000:9.1f} ms")

    if args.netlist:
        with open(args.netlist, "w") as f:
            f.write(result.netlist_text + "\n")
        print(f"netlist written to {args.netlist}")

    if args.simulate:
        sim = analyzer.simulate(result, frequency_hz=args.frequency)
        _print_sim(sim)
    return 0


def _print_sim(sim) -> None:
    if not sim.ok:
        print(f"simulation failed: {sim.error}")
        return
    print("=== node voltages ===")
    print(json.dumps(sim.node_voltages, indent=2, ensure_ascii=False))
    print("=== branch currents ===")
    print(json.dumps(sim.branch_currents, indent=2, ensure_ascii=False))


def _cmd_simulate(args) -> int:
    from .core.config import SimConfig
    from .netlist.values import detect_analysis_mode
    from .sim.engine import perform_ac_analysis_text, perform_dc_analysis

    with open(args.netlist) as f:
        text = f.read()
    mode = args.mode or ("ac" if detect_analysis_mode(text) == "AC" else "dc")
    if mode == "ac":
        sim = perform_ac_analysis_text(text, args.frequency, SimConfig())
    else:
        sim = perform_dc_analysis(text, SimConfig())
    _print_sim(sim)
    return 0 if sim.ok else 1


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="circuitvision_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pa = sub.add_parser("analyze", help="image → netlist (± simulation)")
    pa.add_argument("image")
    pa.add_argument("--netlist", help="write netlist text to this path")
    pa.add_argument("--simulate", choices=["dc", "ac"], default=None)
    pa.add_argument("--frequency", type=float, default=60.0)
    pa.add_argument("--final", action="store_true", help="run VLM value pass")
    pa.add_argument("--scale", default="l", choices=list("nsmlx"))
    pa.add_argument("--yolo-checkpoint")
    pa.add_argument("--sam2-checkpoint")
    pa.add_argument("--force-sam2", action="store_true",
                    help="use SAM2 with random weights (debug)")

    ps = sub.add_parser("simulate", help="simulate an existing netlist file")
    ps.add_argument("netlist")
    ps.add_argument("--mode", choices=["dc", "ac"], default=None)
    ps.add_argument("--frequency", type=float, default=60.0)

    args = parser.parse_args(argv)
    if args.cmd == "analyze":
        return _cmd_analyze(args)
    if args.cmd == "simulate":
        return _cmd_simulate(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
