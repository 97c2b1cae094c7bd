"""Command-line interface.

    python -m circuitvision_tpu.cli analyze circuit.png --netlist out.cir
    python -m circuitvision_tpu.cli analyze circuit.png --simulate dc
    python -m circuitvision_tpu.cli analyze circuit.png --simulate ac --frequency 60
    python -m circuitvision_tpu.cli analyze-batch imgs/*.png --out-dir netlists/
    python -m circuitvision_tpu.cli simulate netlist.cir
    python -m circuitvision_tpu.cli serve --port 8501

The library-level capability surface of the reference's Streamlit app
(app.py) without the UI: detection, segmentation, topology, netlist,
VLM enrichment (when API keys are configured), and DC/AC simulation.
`analyze-batch` runs the mesh-sharded throughput pipeline
(pipeline/batch.py) over many images; `serve` starts the web UI.
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


def _cmd_analyze_batch(args) -> int:
    """Batched multi-image analysis over the device mesh — the
    throughput path (pipeline/batch.py), with per-image netlist output."""
    import os

    from .core.config import DetectorConfig, PipelineConfig
    from .io.image_io import load_image
    from .models.checkpoint import load_variables
    from .pipeline.analyzer import CircuitAnalyzerTPU

    if args.distributed:
        # Must run before ANY jax call (checkpoint load, analyzer init):
        # jax.distributed.initialize refuses once the backend exists.
        from .parallel import multihost

        multihost.initialize()

    exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
    paths = []
    for p in args.images:
        if os.path.isdir(p):
            paths.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.lower().endswith(exts)
            ))
        else:
            paths.append(p)
    if not paths:
        print("no images found", file=sys.stderr)
        return 1

    yolo_vars = load_variables(args.yolo_checkpoint) if args.yolo_checkpoint else None
    sam_vars = load_variables(args.sam2_checkpoint) if args.sam2_checkpoint else None
    cfg = PipelineConfig(
        detector=DetectorConfig(scale=args.scale, img_size=args.det_size),
        use_sam2=sam_vars is not None or args.force_sam2,
    )
    analyzer = CircuitAnalyzerTPU(
        config=cfg,
        yolo_variables=yolo_vars,
        sam2_variables=sam_vars,
        use_sam2=cfg.use_sam2,
    )

    import time

    if args.distributed:
        return _run_distributed(args, analyzer, paths)

    images = [load_image(p) for p in paths]
    t0 = time.time()
    results = analyzer.analyze_batch(
        images, batch_size=args.batch_size, finalize=args.final
    )
    dt = time.time() - t0

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    for path, res in zip(paths, results):
        name = os.path.splitext(os.path.basename(path))[0]
        n_lines = len((res.netlist_text or "").splitlines())
        print(f"{name}: {len(res.bboxes_orig_nms)} detections, "
              f"{len(res.nodes)} nodes, {n_lines} netlist lines")
        if args.out_dir:
            with open(os.path.join(args.out_dir, f"{name}.cir"), "w") as f:
                f.write((res.netlist_text or "") + "\n")
    print(f"{len(images)} images in {dt:.2f}s "
          f"({len(images) / dt:.2f} images/s incl. compile)")
    return 0


class _LazyImages:
    """len/getitem view over image paths that decodes on access, so each
    process of a distributed run only decodes its own local_span."""

    def __init__(self, paths):
        from .io.image_io import load_image

        self._paths = paths
        self._load = load_image

    def __len__(self):
        return len(self._paths)

    def __getitem__(self, i):
        return self._load(self._paths[i])


def _run_distributed(args, analyzer, paths) -> int:
    """Multi-host analyze-batch: one process per host (pod slice or
    JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID env), each
    analyzing its span of the image list on its own chips; process 0
    writes the gathered netlists. Single-process (no coordinator) it
    degrades to the whole list on the local mesh. multihost.initialize()
    already ran at the top of _cmd_analyze_batch (before any jax call)."""
    import os
    import time

    import jax

    from .parallel import multihost

    t0 = time.time()
    local_results, netlists = multihost.analyze_many_distributed(
        analyzer, _LazyImages(paths), batch_size=args.batch_size,
        final=getattr(args, "final", False),
    )
    dt = time.time() - t0

    pid, nproc = jax.process_index(), jax.process_count()
    span = multihost.balanced_span(len(paths))
    for gi, res in zip(span, local_results):
        name = os.path.splitext(os.path.basename(paths[gi]))[0]
        print(f"[proc {pid}] {name}: {len(res.bboxes_orig_nms)} detections, "
              f"{len(res.nodes)} nodes")
    if pid == 0:
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            for path, net in zip(paths, netlists):
                name = os.path.splitext(os.path.basename(path))[0]
                with open(os.path.join(args.out_dir, f"{name}.cir"), "w") as f:
                    f.write((net["netlist"] or net["valueless"] or "") + "\n")
        # Unlike the single-host path (which decodes before timing),
        # this window includes per-host JPEG decode — the lazy span view
        # defers it into the pipeline — so label it as such.
        print(f"{len(paths)} images over {nproc} process(es) in {dt:.2f}s "
              f"({len(paths) / dt:.2f} images/s incl. decode+compile)")
    return 0


def _cmd_serve(args) -> int:
    from . import webapp

    argv = ["--port", str(args.port), "--scale", args.scale]
    if args.yolo_checkpoint:
        argv += ["--yolo-checkpoint", args.yolo_checkpoint]
    if args.sam2_checkpoint:
        argv += ["--sam2-checkpoint", args.sam2_checkpoint]
    return webapp.main(argv) or 0


def _cmd_serve_batch(args) -> int:
    """Production serving: micro-batching HTTP endpoint (pipeline/server.py).

    Unlike `serve` (the interactive webapp, one analysis at a time),
    this groups concurrent POST /analyze requests into device batches."""
    from .core.config import DetectorConfig, PipelineConfig
    from .models.checkpoint import load_variables
    from .pipeline.analyzer import CircuitAnalyzerTPU
    from .pipeline.server import serve

    yolo_vars = load_variables(args.yolo_checkpoint) if args.yolo_checkpoint else None
    sam_vars = load_variables(args.sam2_checkpoint) if args.sam2_checkpoint else None
    cfg = PipelineConfig(
        detector=DetectorConfig(scale=args.scale, img_size=args.det_size),
        use_sam2=sam_vars is not None or args.force_sam2,
    )
    analyzer = CircuitAnalyzerTPU(
        config=cfg,
        yolo_variables=yolo_vars,
        sam2_variables=sam_vars,
        use_sam2=cfg.use_sam2,
    )
    serve(
        analyzer,
        port=args.port,
        batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms,
        final=args.final,
    )
    return 0


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
    parser.add_argument(
        "--platform", choices=["auto", "cpu", "tpu"], default="auto",
        help="force the jax platform (default: auto-detect; 'cpu' also "
        "wins over a TPU plugin that rewrites JAX_PLATFORMS)",
    )
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

    pb = sub.add_parser(
        "analyze-batch",
        help="mesh-sharded batched analysis of many images (throughput path)",
    )
    pb.add_argument("images", nargs="+",
                    help="image paths, or a single directory of images")
    pb.add_argument("--out-dir", help="write per-image netlists here")
    pb.add_argument("--batch-size", type=int, default=None)
    pb.add_argument("--final", action="store_true",
                    help="run the VLM value pass, batched when the client "
                    "supports it (on-TPU PaliGemma reader)")
    pb.add_argument("--scale", default="l", choices=list("nsmlx"))
    pb.add_argument("--det-size", type=int, default=640,
                    help="detector input size (smaller = faster CPU tests)")
    pb.add_argument("--yolo-checkpoint")
    pb.add_argument("--sam2-checkpoint")
    pb.add_argument("--force-sam2", action="store_true")
    pb.add_argument(
        "--distributed", action="store_true",
        help="multi-host: join the jax.distributed runtime (pod "
             "auto-config or JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
             "JAX_PROCESS_ID env) and split the image list across "
             "processes (parallel/multihost.py); run one copy of this "
             "command per host")

    ps = sub.add_parser("simulate", help="simulate an existing netlist file")
    ps.add_argument("netlist")
    ps.add_argument("--mode", choices=["dc", "ac"], default=None)
    ps.add_argument("--frequency", type=float, default=60.0)

    pv = sub.add_parser("serve", help="start the web UI (webapp.py)")
    pv.add_argument("--port", type=int, default=8501)
    pv.add_argument("--scale", default="l", choices=list("nsmlx"))
    pv.add_argument("--yolo-checkpoint")
    pv.add_argument("--sam2-checkpoint")

    pp = sub.add_parser(
        "serve-batch",
        help="production serving: micro-batching HTTP endpoint "
        "(groups concurrent requests into device batches)",
    )
    pp.add_argument("--port", type=int, default=8600)
    pp.add_argument("--batch-size", type=int, default=None)
    pp.add_argument("--max-wait-ms", type=float, default=25.0,
                    help="flush a non-full batch once its oldest request "
                    "has waited this long")
    pp.add_argument("--final", action="store_true",
                    help="run the batched VLM value pass per served batch")
    pp.add_argument("--scale", default="l", choices=list("nsmlx"))
    pp.add_argument("--det-size", type=int, default=640)
    pp.add_argument("--yolo-checkpoint")
    pp.add_argument("--sam2-checkpoint")
    pp.add_argument("--force-sam2", action="store_true")

    args = parser.parse_args(argv)
    if getattr(args, "platform", "auto") != "auto":
        # Must win over the TPU plugin's JAX_PLATFORMS rewrite (the env
        # var alone is rewritten to "axon,cpu"; the explicit config
        # update is authoritative — same pattern as __graft_entry__).
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.cmd == "analyze":
        return _cmd_analyze(args)
    if args.cmd == "analyze-batch":
        return _cmd_analyze_batch(args)
    if args.cmd == "simulate":
        return _cmd_simulate(args)
    if args.cmd == "serve":
        return _cmd_serve(args)
    if args.cmd == "serve-batch":
        return _cmd_serve_batch(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
