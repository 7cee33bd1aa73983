"""Metric math vs known values (SURVEY.md §4: 'metric functions vs skimage')."""
import jax.numpy as jnp
import numpy as np

from splatformer_tpu.training.metrics import MetricComputer, psnr, ssim


def test_psnr_known_values(rng):
    a = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)), jnp.float32)
    assert float(psnr(a, a)[0]) > 90
    b = jnp.clip(a + 0.1, 0, 1)
    mse = float(jnp.mean((a - b) ** 2, axis=(1, 2, 3))[0])
    np.testing.assert_allclose(float(psnr(a, b)[0]),
                               20 * np.log10(1 / np.sqrt(mse)), rtol=1e-5)


def test_ssim_identical_and_vs_skimage(rng):
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    assert float(ssim(a, a)[0]) > 0.999
    b = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    ours = float(ssim(a, b)[0])
    try:
        from skimage.metrics import structural_similarity
        ref = structural_similarity(
            np.asarray(a[0]), np.asarray(b[0]), channel_axis=2,
            data_range=1.0, gaussian_weights=True, sigma=1.5,
            use_sample_covariance=False)
        # padding conventions differ at borders (reference uses zero 'same'
        # padding; skimage crops) — agree loosely
        assert abs(ours - ref) < 0.08, (ours, ref)
    except ImportError:
        pass
    assert -1.0 <= ours <= 1.0


def test_metric_computer_accumulation(rng):
    mc = MetricComputer()
    a = jnp.asarray(rng.uniform(size=(3, 16, 16, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(3, 16, 16, 3)), jnp.float32)
    mc.update(a, b, name="scene0")
    mc.update(a, a, name="scene1")
    fin = mc.finalize()
    assert set(fin) == {"psnr", "ssim"}
    assert len(mc.results_dict["scene0"]["psnr"]) == 3
    s = mc.sum()
    assert np.isclose(s["psnr"], sum(mc.results_dict["scene0"]["psnr"])
                      + sum(mc.results_dict["scene1"]["psnr"]), rtol=1e-5)


def test_lpips_architecture_runs(rng):
    # no pretrained weights in this environment: check the module shape path
    import jax
    from splatformer_tpu.models.lpips import LPIPS
    m = LPIPS()
    a = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    params = m.init(jax.random.key(0), a, a)
    d = m.apply(params, a, a)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    b = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    d2 = m.apply(params, a, b)
    assert (np.asarray(d2) > 0).all()


def test_lpips_weight_contract(tmp_path):
    """A malformed weights file must raise, not silently fall back to
    L1-only (VERDICT r3 missing #3); a missing file is the documented
    None fallback; a contract-conforming file loads."""
    import pytest
    from splatformer_tpu.models.lpips import (expected_weight_shapes,
                                              load_lpips_params)

    assert load_lpips_params(str(tmp_path / "absent.npz")) is None

    shapes = expected_weight_shapes()
    good = {k: np.zeros(s, np.float32) + 0.01 for k, s in shapes.items()}
    ok_path = tmp_path / "ok.npz"
    np.savez(ok_path, **good)
    params = load_lpips_params(str(ok_path))
    assert params is not None and "lin0" in params

    # layout perturbations: missing key, wrong shape, non-finite
    missing = dict(good)
    missing.pop("vgg/conv2_1/kernel")
    p = tmp_path / "missing.npz"
    np.savez(p, **missing)
    with pytest.raises(ValueError, match="missing key"):
        load_lpips_params(str(p))

    wrong = dict(good)
    wrong["lin3"] = np.zeros((7,), np.float32)
    p = tmp_path / "wrong.npz"
    np.savez(p, **wrong)
    with pytest.raises(ValueError, match="shape"):
        load_lpips_params(str(p))

    nan = dict(good)
    nan["vgg/conv0_0/bias"] = np.full(shapes["vgg/conv0_0/bias"], np.nan,
                                      np.float32)
    p = tmp_path / "nan.npz"
    np.savez(p, **nan)
    with pytest.raises(ValueError, match="non-finite"):
        load_lpips_params(str(p))
