"""CLI smoke tests (test preset, synthetic images)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

ANN = None


@pytest.fixture(scope="module")
def ann_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "annotations.txt"
    lines = ["file_name,ids,labels,xmin,ymin,xmax,ymax,captions"]
    classes = list(range(258, 268))
    for i in range(60):
        cls = classes[i % 10]
        lines.append(f"img_{i:03d}.jpg,x,{cls},10,20,110,120,"
                     "The defect silk_spot is located at the center of the image.")
    path.write_text("\n".join(lines))
    return str(path)


def run_cli(*args):
    env = dict(os.environ, JAX_PLATFORMS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "from mdcnet_tpu.cli.main import main; main(%r)" % (list(args),))
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=600)


class TestCli:
    def test_train_smoke(self, ann_file, tmp_path):
        r = run_cli("train", "--annotations", ann_file, "--preset", "test",
                    "--synthetic-images", "--epochs", "1",
                    "--batch-size", "8",
                    "--checkpoint-dir", str(tmp_path / "ck"))
        assert r.returncode == 0, r.stderr[-2000:]
        assert "done:" in r.stdout

    def test_infer_smoke(self, ann_file):
        r = run_cli("infer", "--annotations", ann_file, "--preset", "test",
                    "--synthetic-images")
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(l) for l in r.stdout.splitlines()
                if l.startswith("{")]
        assert rows and all("caption" in row for row in rows)

    def test_infer_full_split_with_overlay_flags(self, ann_file, tmp_path):
        overlay_dir = str(tmp_path / "ov")
        r = run_cli("infer", "--annotations", ann_file, "--preset", "test",
                    "--synthetic-images", "--limit-batches", "2",
                    "--save-overlays", overlay_dir)
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(l) for l in r.stdout.splitlines()
                if l.startswith("{")]
        assert rows
        assert os.path.isdir(overlay_dir)

    def test_eval_smoke(self, ann_file):
        r = run_cli("eval", "--annotations", ann_file, "--preset", "test",
                    "--synthetic-images", "--batch-size", "8")
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert "map@0.3" in out and "bleu" in out
