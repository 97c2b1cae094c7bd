"""SPICE simulation: parsing, DC operating point, AC phasors, engine."""
import math

import numpy as np
import pytest

from circuitvision_tpu.core.types import NetlistLine
from circuitvision_tpu.sim.engine import (
    perform_ac_analysis,
    perform_dc_analysis,
)
from circuitvision_tpu.sim.mna import SimulationError, solve_ac, solve_dc
from circuitvision_tpu.sim.netlist_parse import NetlistParseError, parse_netlist


class TestParse:
    def test_basic_elements(self):
        els = parse_netlist("V1 1 0 5\nR1 1 0 10k\nC1 1 0 1u")
        assert [e.kind for e in els] == ["V", "R", "C"]
        assert els[1].dc_value == 10e3
        assert els[2].dc_value == 1e-6

    def test_ac_spec(self):
        els = parse_netlist("V1 1 0 0 AC 4.0 -45.0")
        el = els[0]
        assert el.dc_value == 0.0
        assert el.ac_mag == 4.0
        assert el.ac_phase_deg == -45.0
        assert abs(el.ac_phasor - 4.0 * np.exp(-1j * math.pi / 4)) < 1e-9

    def test_reactance_value(self):
        els = parse_netlist("C1 1 0 -j50")
        assert els[0].reactance == complex(0, -50)

    def test_comments_and_directives_skipped(self):
        els = parse_netlist("* comment\n.title x\nR1 1 0 100\n\n.end")
        assert len(els) == 1

    def test_spice_scale_factors(self):
        """Deck tokens use ngspice semantics: case-insensitive scale
        factors ('10M' = milli, '10MEG' = mega, '47f' = femto), with
        trailing unit letters ignored — the engine the reference
        simulates through reads them exactly that way."""
        from circuitvision_tpu.sim.netlist_parse import parse_spice_value

        assert parse_spice_value("47f") == pytest.approx(47e-15)
        assert parse_spice_value("10M") == pytest.approx(10e-3)
        assert parse_spice_value("10MEG") == pytest.approx(10e6)
        assert parse_spice_value("10kohm") == pytest.approx(10e3)
        assert parse_spice_value("47pF") == pytest.approx(47e-12)
        assert parse_spice_value("5a") == pytest.approx(5e-18)
        assert parse_spice_value("2.5") == 2.5
        assert parse_spice_value("1e-6") == pytest.approx(1e-6)
        # j-reactance forms still route to the complex parser
        assert parse_spice_value("j5") == 5j
        assert parse_spice_value("100-j50") == 100 - 50j
        els = parse_netlist("C1 1 0 47f\nR1 1 0 10MEG")
        assert els[0].dc_value == pytest.approx(47e-15)
        assert els[1].dc_value == pytest.approx(10e6)

    def test_ac_resistor_needs_value(self):
        with pytest.raises(SimulationError, match="nonzero value"):
            solve_ac("R1 1 0\nV1 1 0 AC 1 0", 50.0)
        with pytest.raises(SimulationError, match="nonzero value"):
            solve_ac("R1 1 0 0\nV1 1 0 AC 1 0", 50.0)

    def test_none_value_raises(self):
        with pytest.raises(NetlistParseError):
            parse_netlist("R1 1 0 None")


class TestDC:
    def test_voltage_divider(self):
        op = solve_dc("V1 1 0 10\nR1 1 2 1k\nR2 2 0 1k")
        assert op.node_voltages["1"] == pytest.approx(10.0, rel=1e-6)
        assert op.node_voltages["2"] == pytest.approx(5.0, rel=1e-4)
        # current through V1 = -10/2k = -5 mA (SPICE sign convention)
        assert op.branch_currents["v1"] == pytest.approx(-5e-3, rel=1e-4)

    def test_current_source(self):
        op = solve_dc("I1 0 1 1m\nR1 1 0 1k")
        # 1 mA pushed into node 1 through 1k → 1 V
        assert op.node_voltages["1"] == pytest.approx(1.0, rel=1e-4)

    def test_capacitor_open_at_dc(self):
        op = solve_dc("V1 1 0 10\nR1 1 2 1k\nC1 2 0 1u")
        assert op.node_voltages["2"] == pytest.approx(10.0, rel=1e-3)

    def test_inductor_short_at_dc(self):
        op = solve_dc("V1 1 0 10\nR1 1 2 1k\nL1 2 0 1m")
        assert op.node_voltages["2"] == pytest.approx(0.0, abs=1e-6)
        assert op.branch_currents["l1"] == pytest.approx(10e-3, rel=1e-4)

    def test_diode_forward(self):
        op = solve_dc("V1 1 0 5\nR1 1 2 1k\nD1 2 0")
        vd = op.node_voltages["2"]
        assert 0.5 < vd < 0.8  # silicon junction drop

    def test_diode_reverse(self):
        op = solve_dc("V1 1 0 -5\nR1 1 2 1k\nD1 2 0")
        assert op.node_voltages["2"] == pytest.approx(-5.0, rel=1e-2)

    def test_unsupported_element(self):
        with pytest.raises(SimulationError):
            solve_dc("Q1 1 0 2")

    def test_diode_high_current_true_operating_point(self):
        """pnjlim must converge to the actual solution of the diode
        equation — the former 0.9 V stamp clamp 'converged' to a point
        where the implied current was off by orders of magnitude."""
        op = solve_dc("I1 0 1 100\nD1 1 0")
        want = 0.02585 * math.log(100 / 1e-14 + 1)  # n·vt·ln(I/Is+1)
        assert op.node_voltages["1"] == pytest.approx(want, rel=1e-6)

    def test_diode_high_current_native_matches(self):
        from circuitvision_tpu.sim import native_backend as nb

        if nb._load() is None:
            pytest.skip("native solver not built")
        op = nb.solve_dc_native("I1 0 1 100\nD1 1 0")
        want = 0.02585 * math.log(100 / 1e-14 + 1)
        assert op.node_voltages["1"] == pytest.approx(want, rel=1e-6)

    def test_nonconvergence_raises(self):
        """Exhausting Newton iterations must error, not silently return
        the last iterate as a converged operating point."""
        with pytest.raises(SimulationError, match="did not converge"):
            solve_dc("I1 0 1 100\nD1 1 0", max_iters=3)


class TestAC:
    def test_rc_divider_phasor(self):
        # V=1∠0 at 1kHz over R=1k into C=159.15nF (Xc≈1k) → |Vc|≈0.707, -45°
        f = 1000.0
        c = 1.0 / (2 * math.pi * f * 1000.0)
        sol = solve_ac(f"V1 1 0 0 AC 1 0\nR1 1 2 1k\nC1 2 0 {c}", f)
        vc = sol.node_voltages["2"]
        assert abs(vc) == pytest.approx(1 / math.sqrt(2), rel=1e-3)
        assert np.angle(vc, deg=True) == pytest.approx(-45.0, abs=0.1)

    def test_reactance_form(self):
        sol = solve_ac("V1 1 0 0 AC 1 0\nR1 1 2 1000\nC1 2 0 -j1000", 60.0)
        vc = sol.node_voltages["2"]
        assert abs(vc) == pytest.approx(1 / math.sqrt(2), rel=1e-3)

    def test_rl_highpass(self):
        f = 1000.0
        l = 1000.0 / (2 * math.pi * f)  # XL = 1k
        sol = solve_ac(f"V1 1 0 0 AC 1 0\nR1 1 2 1k\nL1 2 0 {l}", f)
        vl = sol.node_voltages["2"]
        assert np.angle(vl, deg=True) == pytest.approx(45.0, abs=0.1)

    def test_source_phase(self):
        sol = solve_ac("V1 1 0 0 AC 4 -45\nR1 1 0 100", 60.0)
        v = sol.node_voltages["1"]
        assert abs(v) == pytest.approx(4.0, rel=1e-6)
        assert np.angle(v, deg=True) == pytest.approx(-45.0, abs=1e-6)

    def test_zero_frequency_rejected(self):
        with pytest.raises(SimulationError):
            solve_ac("V1 1 0 0 AC 1 0\nR1 1 0 1k", 0.0)


class TestEngine:
    def test_dc_formatting(self):
        res = perform_dc_analysis("V1 1 0 10\nR1 1 2 1k\nR2 2 0 1k")
        assert res.ok
        assert res.node_voltages["2"] == "5.000V"
        assert res.branch_currents["v1"] == "-5.000mA"
        assert ".title detected_circuit_dc" in res.deck

    def test_dc_reactive_lines_ignored(self):
        res = perform_dc_analysis("V1 1 0 10\nR1 1 0 1k\nC1 1 0 -j50")
        assert res.ok  # -j50 cap commented out, rest solves

    def test_dc_empty(self):
        res = perform_dc_analysis("")
        assert not res.ok

    def test_dc_error_reported(self):
        res = perform_dc_analysis("R1 1 0 None")
        assert not res.ok and "Error" in res.error

    def test_ac_structured_path(self):
        lines = [
            NetlistLine("V", 1, 1, 0, "4:-45", class_name="voltage.ac"),
            NetlistLine("R", 1, 1, 0, "100", class_name="resistor"),
            NetlistLine("0", 1, 1, 0, None, class_name="gnd"),
        ]
        res = perform_ac_analysis(lines, 60.0)
        assert res.ok
        assert "∠" in res.node_voltages["1"]
        assert res.node_voltages["1"].startswith("4.000 ∠ -45.00°")

    def test_ac_cap_reactance_rewrite(self):
        lines = [
            NetlistLine("V", 1, 1, 0, "AC 10V 60Hz 0deg", class_name="voltage.ac"),
            NetlistLine("R", 1, 1, 2, "1k", class_name="resistor"),
            NetlistLine("C", 1, 2, 0, "-j1000", class_name="capacitor"),
        ]
        res = perform_ac_analysis(lines, 60.0)
        assert res.ok
        mag = float(res.node_voltages["2"].split(" ")[0])
        assert mag == pytest.approx(10 / math.sqrt(2), rel=1e-2)


class TestDependentSources:
    """E/G/F/H stamps (the reference's ngspice accepts full SPICE decks;
    netlist_map emits E and G prefixes, src/circuit_analyzer.py:83,86)."""

    def test_vcvs(self):
        op = solve_dc("V1 1 0 1\nR1 1 0 1k\nE1 2 0 1 0 5\nR2 2 0 1k")
        assert op.node_voltages["2"] == pytest.approx(5.0, rel=1e-6)

    def test_vccs(self):
        op = solve_dc("V1 1 0 1\nR1 1 0 1k\nG1 0 2 1 0 1m\nR2 2 0 1k")
        assert op.node_voltages["2"] == pytest.approx(1.0, rel=1e-4)

    def test_cccs(self):
        # i(V1) = -1 mA (SPICE convention); F gain 2 into 1k → -2 V.
        op = solve_dc("V1 1 0 1\nR1 1 0 1k\nF1 0 2 V1 2\nR2 2 0 1k")
        assert op.node_voltages["2"] == pytest.approx(-2.0, rel=1e-4)

    def test_ccvs(self):
        op = solve_dc("V1 1 0 1\nR1 1 0 1k\nH1 2 0 V1 2k\nR2 2 0 1k")
        assert op.node_voltages["2"] == pytest.approx(-2.0, rel=1e-4)

    def test_vcvs_ac(self):
        sol = solve_ac("V1 1 0 0 AC 1 0\nR1 1 0 1k\nE1 2 0 1 0 5\nR2 2 0 1k", 60.0)
        assert abs(sol.node_voltages["2"]) == pytest.approx(5.0, rel=1e-6)

    def test_missing_control_source(self):
        with pytest.raises(SimulationError):
            solve_dc("V1 1 0 1\nR1 1 0 1k\nF1 0 2 V9 2\nR2 2 0 1k")

    def test_short_e_line_rejected(self):
        with pytest.raises(NetlistParseError):
            parse_netlist("E1 2 0 5")


class TestPhasorPlot:
    def test_renders_rgb_array(self):
        from circuitvision_tpu.sim.plots import phasor_plot

        sol = solve_ac("V1 1 0 0 AC 4 -45\nR1 1 2 100\nC1 2 0 -j100", 60.0)
        img = phasor_plot(sol)
        assert img is not None
        assert img.ndim == 3 and img.shape[2] == 3
        assert img.shape[0] > 100 and img.shape[1] > 100
