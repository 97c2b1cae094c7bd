"""Polar phasor plots for AC analysis results.

Port of the reference's matplotlib phasor rendering
(src/spice_simulator.py:264-299): voltage and current phasors on paired
polar axes, magnitudes as radii, angles as phases. Returns an RGB array
so the CLI/web UI can embed it without a display.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .mna import ACSolution


def phasor_plot(solution: ACSolution, figsize=(12, 5)) -> Optional[np.ndarray]:
    """Render voltage + current phasor diagrams; None if matplotlib is
    unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return None

    fig, (ax1, ax2) = plt.subplots(
        1, 2, figsize=figsize, subplot_kw={"projection": "polar"}
    )

    max_v = 0.0
    for node, value in solution.node_voltages.items():
        if str(node) == "0":
            continue
        mag, angle = abs(value), np.angle(value)
        max_v = max(max_v, mag)
        ax1.plot([0, angle], [0, mag], label=f"V({node})", marker="o", linewidth=2)
    ax1.set_title("Voltage Phasors")
    ax1.set_rmax(max_v * 1.2 if max_v > 0 else 1)
    ax1.grid(True)
    if solution.node_voltages:
        ax1.legend()

    max_i = 0.0
    for branch, value in solution.branch_currents.items():
        mag, angle = abs(value), np.angle(value)
        max_i = max(max_i, mag)
        ax2.plot([0, angle], [0, mag], label=str(branch), marker="o", linewidth=2)
    ax2.set_title("Current Phasors")
    ax2.set_rmax(max_i * 1.2 if max_i > 0 else 1)
    ax2.grid(True)
    if solution.branch_currents:
        ax2.legend()

    fig.tight_layout()
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img
