"""Value parsing, AC string parsing, mode auto-detection, DC/AC rewriting."""
import math

import pytest

from circuitvision_tpu.netlist.values import (
    detect_analysis_mode,
    parse_ac_string,
    parse_component_value,
    preprocess_netlist_for_dc,
    rewrite_value_for_ac,
)


class TestParseComponentValue:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("10", 10.0),
            ("10.5", 10.5),
            ("10k", 10e3),
            ("10K", 10e3),
            ("2.2M", 2.2e6),
            ("100m", 0.1),
            ("0.5u", 0.5e-6),
            ("22n", 22e-9),
            ("47p", 47e-12),
            ("1G", 1e9),
            ("3meg", 3e6),
            ("5e-5", 5e-5),
            ("5E-5", 5e-5),
            ("5x10^-5", 5e-5),
            ("5 x 10^-5", 5e-5),
            ("5 * 10^-5", 5e-5),
            ("10kΩ", 10e3),
            ("5V", 5.0),
            ("2.2uF", 2.2e-6),
            ("100ohm", 100.0),
        ],
    )
    def test_scalar(self, raw, expected):
        assert parse_component_value(raw) == pytest.approx(expected)

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("5+j3", complex(5, 3)),
            ("5-j3", complex(5, -3)),
            ("100-j50", complex(100, -50)),
            ("5+3j", complex(5, 3)),
            ("j5", complex(0, 5)),
            ("-j3", complex(0, -3)),
        ],
    )
    def test_complex(self, raw, expected):
        assert parse_component_value(raw) == expected

    def test_numeric_passthrough(self):
        assert parse_component_value(4.7) == 4.7

    def test_invalid_raises(self):
        with pytest.raises(ValueError):
            parse_component_value("???")


class TestParseACString:
    def test_long_form(self):
        out = parse_ac_string("AC 5V 1kHz 0deg")
        assert out == {"dc_offset": 0, "mag": 5.0, "phase": 0.0}

    def test_long_form_negative_phase(self):
        out = parse_ac_string("AC 10.5mA 50.2Hz -45.5deg")
        assert out == {"dc_offset": 0, "mag": 10.5, "phase": -45.5}

    def test_short_form(self):
        out = parse_ac_string("AC 5V 0deg")
        assert out == {"dc_offset": 0, "mag": 5.0, "phase": 0.0}

    def test_mag_phase_form(self):
        assert parse_ac_string("4:-45") == {"dc_offset": 0, "mag": 4.0, "phase": -45.0}
        assert parse_ac_string("1:45") == {"dc_offset": 0, "mag": 1.0, "phase": 45.0}

    def test_non_string(self):
        assert parse_ac_string(5.0) is None
        assert parse_ac_string(None) is None

    def test_unparseable(self):
        assert parse_ac_string("hello") is None


class TestDetectMode:
    def test_dc_default(self):
        assert detect_analysis_mode("V1 1 0 5\nR1 1 0 100") == "DC"

    def test_ac_keyword(self):
        assert detect_analysis_mode("V1 1 0 0 AC 1 0\nR1 1 0 100") == "AC"

    def test_mag_phase_value(self):
        assert detect_analysis_mode("V3 3 0 4:-45\nR1 3 0 100") == "AC"

    def test_empty(self):
        assert detect_analysis_mode("") == "DC"

    def test_comment_lines_skipped(self):
        assert detect_analysis_mode("* V1 1 0 AC 1 0") == "DC"


class TestDCPreprocess:
    def test_reactive_cap_commented(self):
        text = "C1 1 0 -j50\nR1 1 0 100"
        out = preprocess_netlist_for_dc(text)
        lines = out.split("\n")
        assert lines[0].startswith("* C1 1 0 -j50")
        assert lines[1] == "R1 1 0 100"

    def test_reactive_inductor_commented(self):
        out = preprocess_netlist_for_dc("L1 1 0 j20")
        assert out.startswith("* L1 1 0 j20")

    def test_normal_cap_untouched(self):
        out = preprocess_netlist_for_dc("C1 1 0 1u")
        assert out == "C1 1 0 1u"


class TestACRewrite:
    def test_source_phasor(self):
        assert rewrite_value_for_ac("V", "4:-45", 60.0) == "0 AC 4.0 -45.0"

    def test_source_unparseable_ac_fallback(self):
        assert rewrite_value_for_ac("V", "AC garbage", 60.0) == "0 AC 1 0"

    def test_source_plain_value_unchanged(self):
        assert rewrite_value_for_ac("V", "5", 60.0) == "5"

    def test_capacitor_reactance(self):
        c = rewrite_value_for_ac("C", "-j50", 60.0)
        assert c == pytest.approx(1.0 / (2 * math.pi * 60.0 * 50.0))

    def test_inductor_reactance_j_prefix(self):
        l = rewrite_value_for_ac("L", "j20", 60.0)
        assert l == pytest.approx(20.0 / (2 * math.pi * 60.0))

    def test_inductor_reactance_j_suffix(self):
        l = rewrite_value_for_ac("L", "20j", 60.0)
        assert l == pytest.approx(20.0 / (2 * math.pi * 60.0))

    def test_resistor_unchanged(self):
        assert rewrite_value_for_ac("R", "100", 60.0) == "100"
