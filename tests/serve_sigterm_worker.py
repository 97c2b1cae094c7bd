"""Subprocess target for the SIGTERM graceful-shutdown test.

Starts pipeline.server.serve() on an ephemeral port (printed on
stdout), analyzes nothing — the test only needs the serve loop running
in a real main thread (signal handlers are main-thread-only) so it can
deliver a real SIGTERM and assert a clean exit 0 through the drain
path. Run with: python tests/serve_sigterm_worker.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import socket


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )

    from circuitvision_tpu.core.config import DetectorConfig, PipelineConfig
    from circuitvision_tpu.enrich.client import FakeVLMClient
    from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU
    from circuitvision_tpu.pipeline import server as srv

    analyzer = CircuitAnalyzerTPU(
        config=PipelineConfig(
            detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
            use_sam2=False,
        ),
        use_sam2=False,
        vlm_client=FakeVLMClient(),
    )

    # ephemeral port, announced to the parent before serve() blocks
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    print(f"PORT={port}", flush=True)

    # batch_size=None → the mesh default (divisible by however many
    # devices the inherited XLA_FLAGS force on this process).
    srv.serve(analyzer, port=port, batch_size=None, max_wait_ms=10)
    print("DRAINED", flush=True)


if __name__ == "__main__":
    main()
