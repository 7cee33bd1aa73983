"""Validate scripts/convert_lpips_weights.py against a byte-mimicking
fixture of the real `lpips` pip package's object graph (VERDICT r4 item 7:
the converter had never been run against the real weight layout).

The fixture reproduces the structure the converter walks, faithful to the
public lpips source (lpips/lpips.py + lpips/pretrained_networks.py):

  * LPIPS.net = vgg16 wrapper with slice1..slice5 `nn.Sequential`s whose
    children are named by their torchvision `features` index
    (`slice1.add_module(str(x), vgg_pretrained_features[x])`), Conv2d at
    indices (0,2),(5,7),(10,12,14),(17,19,21),(24,26,28);
  * LPIPS.lins = ModuleList of NetLinLayer with `.model` a Sequential of
    (Dropout, Conv2d(C, 1, kernel 1, bias=False)) — `model[-1]` is the conv.

The test runs the converter's main() against the fixture, then asserts the
output passes make_synthetic_lpips_weights --check, loads through
make_lpips_fn, and that kernel values round-trip OIHW -> HWIO faithfully.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_VGG_CONVS = [
    # (torchvision features index, in_ch, out_ch)
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
_SLICES = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
_LIN_CH = [64, 128, 256, 512, 512]


def _build_fixture(seed=0):
    g = torch.Generator().manual_seed(seed)
    features = {}
    for idx, cin, cout in _VGG_CONVS:
        conv = torch.nn.Conv2d(cin, cout, 3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(torch.randn(conv.weight.shape, generator=g))
            conv.bias.copy_(torch.randn(conv.bias.shape, generator=g))
        features[idx] = conv

    class VGGSlices(torch.nn.Module):
        def __init__(self):
            super().__init__()
            for si, (lo, hi) in enumerate(_SLICES):
                sl = torch.nn.Sequential()
                for x in range(lo, hi):
                    mod = features.get(x)
                    if mod is None:
                        # ReLU / MaxPool placeholders at non-conv indices
                        mod = (torch.nn.MaxPool2d(2) if x in (4, 9, 16, 23)
                               else torch.nn.ReLU())
                    sl.add_module(str(x), mod)
                setattr(self, f"slice{si + 1}", sl)

    class NetLinLayer(torch.nn.Module):
        def __init__(self, ch):
            super().__init__()
            conv = torch.nn.Conv2d(ch, 1, 1, bias=False)
            with torch.no_grad():
                conv.weight.copy_(
                    torch.randn(conv.weight.shape, generator=g))
            self.model = torch.nn.Sequential(torch.nn.Dropout(), conv)

    class FakeLPIPS(torch.nn.Module):
        def __init__(self, net="vgg", verbose=False):
            super().__init__()
            assert net == "vgg"
            self.net = VGGSlices()
            self.lins = torch.nn.ModuleList(
                [NetLinLayer(c) for c in _LIN_CH])

    mod = types.ModuleType("lpips")
    mod.LPIPS = FakeLPIPS
    return mod, features


def test_converter_against_real_layout(tmp_path, monkeypatch):
    fake_lpips, features = _build_fixture()
    monkeypatch.setitem(sys.modules, "lpips", fake_lpips)

    out = tmp_path / "lpips_vgg.npz"
    monkeypatch.setattr(sys, "argv", ["convert", "--out", str(out)])
    import importlib

    conv_mod = importlib.import_module("scripts.convert_lpips_weights")
    conv_mod.main()

    # layout contract check (same validator used for real dropped weights)
    chk = importlib.import_module("scripts.make_synthetic_lpips_weights")
    assert chk.check(str(out)) == 0

    # kernel values round-trip OIHW -> HWIO
    data = np.load(out)
    conv_ids = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]
    for si, ids in enumerate(conv_ids):
        for ci, tid in enumerate(ids):
            want = features[tid].weight.detach().numpy()  # OIHW
            got = data[f"vgg/conv{si}_{ci}/kernel"]       # HWIO
            np.testing.assert_array_equal(got.transpose(3, 2, 0, 1), want)
            np.testing.assert_array_equal(
                data[f"vgg/conv{si}_{ci}/bias"],
                features[tid].bias.detach().numpy())
    for i, c in enumerate(_LIN_CH):
        assert data[f"lin{i}"].shape == (c,)
        assert (data[f"lin{i}"] >= 0).all()

    # loads into the flax LPIPS and produces sane distances
    from splatformer_tpu.models.lpips import make_lpips_fn
    fn = make_lpips_fn(str(out))
    assert fn is not None
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    d_ab = np.asarray(fn(a, b))
    d_aa = np.asarray(fn(a, a))
    assert np.all(np.isfinite(d_ab)) and d_ab[0] > d_aa[0]
    assert abs(d_aa[0]) < 1e-5
