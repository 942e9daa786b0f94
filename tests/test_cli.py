"""CLI + checkpoint/resume end-to-end tests."""

import os

import numpy as np

from cpu_ray_tracer_tpu.cli import main
from cpu_ray_tracer_tpu.utils import checkpoint as ckpt

from tests.conftest import OUR_ASSETS

CUBE = os.path.join(OUR_ASSETS, "scenes", "cube_scene.xml")


class TestCli:
    def test_whitted_writes_png_and_metrics(self, tmp_path):
        out = str(tmp_path / "w.png")
        jl = str(tmp_path / "m.jsonl")
        rc = main(
            ["--scene-xml", CUBE, "--integrator", "whitted", "--width", "32",
             "--height", "20", "--out", out, "--metrics-jsonl", jl]
        )
        assert rc == 0
        assert os.path.getsize(out) > 100
        import json

        rec = json.loads(open(jl).read().strip().splitlines()[-1])
        assert "total_traversal" in rec and rec["total_traversal"] > 0

    def test_pt_checkpoint_resume(self, tmp_path):
        out = str(tmp_path / "p.png")
        ck = str(tmp_path / "film.npz")
        rc = main(
            ["--scene-xml", CUBE, "--integrator", "pathtracer", "--spp", "2",
             "--width", "16", "--height", "8", "--out", out,
             "--checkpoint", ck, "--checkpoint-every", "1"]
        )
        assert rc == 0
        film, _ = ckpt.load_film(ck)
        assert int(film.spp) == 2
        # resume to 4 spp: accumulator continues, not restarts
        rc = main(
            ["--scene-xml", CUBE, "--integrator", "pathtracer", "--spp", "4",
             "--width", "16", "--height", "8", "--out", out,
             "--checkpoint", ck, "--checkpoint-every", "1"]
        )
        assert rc == 0
        film2, _ = ckpt.load_film(ck)
        assert int(film2.spp) == 4
        assert float(np.abs(np.asarray(film2.accum)).sum()) > float(
            np.abs(np.asarray(film.accum)).sum()
        )

    def test_grid_accel_cli(self, tmp_path):
        out = str(tmp_path / "g.png")
        rc = main(
            ["--scene-xml", CUBE, "--integrator", "basics", "--aov", "depth",
             "--layout", "mono", "--accel", "grid", "--width", "16",
             "--height", "8", "--out", out]
        )
        assert rc == 0
