"""Self-contained interactive viewer export (utils/webviewer.py — the
dependency-free replacement for the reference's pyviz3d/three.js export,
/root/reference/visualize.py:322-334)."""
import base64
import json
import os
import re

import numpy as np

from splatformer_tpu.utils.webviewer import export_interactive_viewer


def test_viewer_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    cols_f = rng.uniform(0, 1, (500, 3))          # float colors
    cols_u = (cols_f * 255).astype(np.uint8)
    path = export_interactive_viewer(
        str(tmp_path / "v.html"),
        {"a": (pts, cols_u), "b": (pts * 2, cols_f)}, title="t")
    html = open(path).read()
    # format-escape hygiene: no brace leaks, balanced JS
    js = html.split("<script>")[1].split("</script>")[0]
    assert "{{" not in html
    assert js.count("{") == js.count("}")
    assert js.count("(") == js.count(")")
    # embedded data decodes back to the inputs
    data = json.loads(re.search(r"const DATA = (\[.*?\]);", js,
                                re.S).group(1))
    assert [d["name"] for d in data] == ["a", "b"]
    got = np.frombuffer(base64.b64decode(data[0]["pos"]),
                        np.float32).reshape(-1, 3)
    np.testing.assert_array_equal(got, pts)
    gotc = np.frombuffer(base64.b64decode(data[1]["col"]),
                         np.uint8).reshape(-1, 3)
    np.testing.assert_array_equal(
        gotc, (np.clip(cols_f, 0, 1) * 255).astype(np.uint8))
    # only the first cloud starts visible by default
    assert data[0]["on"] and not data[1]["on"]


def test_viewer_subsamples_large_clouds(tmp_path):
    pts = np.zeros((5000, 3), np.float32)
    cols = np.zeros((5000, 3), np.uint8)
    path = export_interactive_viewer(
        str(tmp_path / "v.html"), {"big": (pts, cols)}, max_points=1000)
    js = open(path).read().split("<script>")[1].split("</script>")[0]
    data = json.loads(re.search(r"const DATA = (\[.*?\]);", js,
                                re.S).group(1))
    n = len(base64.b64decode(data[0]["pos"])) // 12
    assert n == 1000
