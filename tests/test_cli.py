"""CLI surface: analyze-batch (mesh throughput path) and simulate."""
import os

import numpy as np
import pytest

from circuitvision_tpu.cli import main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestSimulateCommand:
    def test_dc_simulate_netlist_file(self, tmp_path, capsys):
        p = tmp_path / "net.cir"
        p.write_text("V1 1 0 5\nR1 1 2 1k\nR2 2 0 1k\n")
        assert main(["simulate", str(p)]) == 0
        out = capsys.readouterr().out
        assert "node voltages" in out and "2.500V" in out

    def test_ac_mode_autodetect(self, tmp_path, capsys):
        p = tmp_path / "net.cir"
        p.write_text("V1 1 0 AC 5 0\nR1 1 2 100\nC1 2 0 -j100\n")
        assert main(["simulate", str(p)]) == 0
        out = capsys.readouterr().out
        assert "∠" in out  # phasor formatting

    def test_bad_netlist_nonzero_exit(self, tmp_path, capsys):
        p = tmp_path / "net.cir"
        p.write_text("garbage line\n")
        assert main(["simulate", str(p)]) == 1


@pytest.mark.slow
class TestAnalyzeBatchCommand:
    def test_directory_to_netlists(self, tmp_path, capsys):
        from PIL import Image

        from circuitvision_tpu.eval.synth import make_circuits

        img_dir = tmp_path / "imgs"
        out_dir = tmp_path / "netlists"
        img_dir.mkdir()
        for c in make_circuits()[:2]:
            Image.fromarray(c.image).save(img_dir / f"{c.name}.png")

        rc = main([
            "--platform", "cpu",
            "analyze-batch", str(img_dir),
            "--scale", "n", "--det-size", "64", "--batch-size", "8",
            "--out-dir", str(out_dir),
        ])
        assert rc == 0
        written = sorted(os.listdir(out_dir))
        assert written == ["golden.cir", "loop.cir"]
        out = capsys.readouterr().out
        assert "2 images in" in out

    def test_no_images_errors(self, tmp_path, capsys):
        empty = tmp_path / "none"
        empty.mkdir()
        assert main(["analyze-batch", str(empty)]) == 1

    def test_distributed_flag_single_process(self, tmp_path, capsys):
        """--distributed with no coordinator degrades to the whole list on
        the local mesh (multihost single-process semantics); netlists are
        written from the gathered list. True multi-process coverage is
        tests/test_multihost.py."""
        from PIL import Image

        from circuitvision_tpu.eval.synth import make_circuits

        img_dir = tmp_path / "imgs"
        out_dir = tmp_path / "netlists"
        img_dir.mkdir()
        for c in make_circuits()[:2]:
            Image.fromarray(c.image).save(img_dir / f"{c.name}.png")

        rc = main([
            "--platform", "cpu",
            "analyze-batch", str(img_dir), "--distributed",
            "--scale", "n", "--det-size", "64", "--batch-size", "8",
            "--out-dir", str(out_dir),
        ])
        assert rc == 0
        assert sorted(os.listdir(out_dir)) == ["golden.cir", "loop.cir"]
        out = capsys.readouterr().out
        assert "2 images over 1 process(es)" in out
        assert "[proc 0] golden:" in out and "[proc 0] loop:" in out
