"""Deployment export: tools/export_model.py serializes the serving step to
a self-contained StableHLO artifact whose deserialized outputs match the
live model exactly (the --check path)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_export_roundtrip(tmp_path):
    out = str(tmp_path / "m.stablehlo")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
         "--out", out, "--img_hw", "64", "96", "--small", "--check"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "roundtrip check ok" in r.stdout
    assert os.path.getsize(out) > 1e6
    assert os.path.exists(out + ".meta.json")


def test_export_int8_roundtrip(tmp_path):
    """--fuse --int8 (the production PTQ order: fold BN into the conv
    kernels, then quantize the folded kernels) bakes the quantized conv
    sites into the artifact; the deserialized program must match the live
    quantized model exactly."""
    import json

    out = str(tmp_path / "m8.stablehlo")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
         "--out", out, "--img_hw", "64", "96", "--width", "64",
         "--fuse", "--int8", "--check"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "roundtrip check ok" in r.stdout
    assert "conv sites quantized" in r.stdout
    meta = json.load(open(out + ".meta.json"))
    assert meta["precision"].startswith("int8-ptq")
