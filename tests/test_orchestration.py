"""End-to-end orchestration smoke test (VERDICT round-1 item 9): run_training
for a few steps on synthetic data with every periodic subsystem exercised —
eval, checkpointing + restore, train-image logging, and an LPIPS loss/metric
driven by synthetic weights (item 7: the path is known-good before real
converted weights are dropped in)."""
import glob
import json
import os

import jax
import numpy as np
import pytest

from splatformer_tpu.configs import build_full_config

_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def write_random_lpips_npz(path):
    """Random-but-valid lpips_vgg.npz in the converter's documented layout
    (scripts/convert_lpips_weights.py)."""
    rng = np.random.default_rng(0)
    out = {}
    cin = 3
    for si, (ch, n_convs) in enumerate(_VGG_STAGES):
        for ci in range(n_convs):
            out[f"vgg/conv{si}_{ci}/kernel"] = rng.normal(
                0, 0.05, (3, 3, cin, ch)).astype(np.float32)
            out[f"vgg/conv{si}_{ci}/bias"] = np.zeros(ch, np.float32)
            cin = ch
    for i in range(5):
        out[f"lin{i}"] = np.abs(rng.normal(
            0, 1, (_VGG_STAGES[i][0],))).astype(np.float32)
    np.savez(path, **out)


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lpips")
    lpips_path = str(tmp / "lpips_vgg.npz")
    write_random_lpips_npz(lpips_path)

    cfg = build_full_config("ptv3_base", "synthetic", "default")
    cfg.dataset.n_scenes = 2
    cfg.dataset.n_gaussians = 256
    cfg.dataset.pad_to = 256
    cfg.dataset.max_gs_num = 256
    cfg.dataset.image_size = 32
    cfg.dataset.image_per_scene = 2
    b = cfg.model.backbone
    b.enc_channels = (8, 16)
    b.dec_channels = (8,)
    b.enc_depths = (1, 1)
    b.enc_num_head = (1, 2)
    b.dec_depths = (1,)
    b.dec_num_head = (1,)
    b.stride = (2,)
    b.patch_size = 16
    b.drop_path = 0.0
    b.pool_capacity_factors = (1.0,)
    cfg.model.output_head_width = 16
    cfg.model.output_head_nlayer = 2
    cfg.model.grid_resolution = 32
    cfg.train.log_interval = 1
    cfg.train.eval_interval = 2
    cfg.train.save_interval = 100  # exercised by the final save
    cfg.train.log_image_interval = 2
    cfg.train.bf16 = False
    cfg.train.lpips_loss_weight = 1.0
    cfg.train.lpips_weights_path = lpips_path
    return cfg


def test_run_training_smoke(tiny_cfg, tmp_path):
    from splatformer_tpu.training.loop import run_training
    from splatformer_tpu.training import checkpoints as ckpt_lib

    out_dir = str(tmp_path / "run")
    state, model, eval_model, test_factories, rcfg, lpips_fn = run_training(
        tiny_cfg, out_dir, max_steps=3)
    assert int(state.step) == 3
    assert lpips_fn is not None  # synthetic weights were picked up

    # history mirrors wandb logging; LPIPS loss term must be active
    with open(os.path.join(out_dir, "history.json")) as f:
        history = json.load(f)
    assert history and "lpips" in history[0]
    assert np.isfinite(history[0]["lpips"])

    # periodic eval ran at opt step 2 with eval LPIPS populated
    eval_dirs = glob.glob(os.path.join(out_dir, "eval", "synthetic", "2"))
    assert eval_dirs, "periodic eval did not run"
    mfiles = glob.glob(os.path.join(eval_dirs[0], "metrics.rank0.json"))
    assert mfiles
    with open(mfiles[0]) as f:
        metrics = json.load(f)
    lp = [v for scene in metrics.values() for v in
          np.atleast_1d(scene.get("lpips", []))]
    assert lp and np.isfinite(lp).all()

    # train-image logging (reference train.py:317-325)
    imgs = glob.glob(os.path.join(out_dir, "train", "*_pred-rank0.png"))
    assert imgs, "log_image_interval produced no train renders"

    # checkpoint restore round-trip: a fresh run resumes at step 3
    assert ckpt_lib.latest_step(os.path.join(out_dir, "checkpoints")) == 3
    state2, *_ = run_training(tiny_cfg, out_dir, max_steps=3)
    assert int(state2.step) == 3


def test_periodic_eval_artifacts(tiny_cfg, tmp_path):
    """Round-3 observability contract: every periodic eval writes the
    refined-vs-input comparison (metrics_input JSON), appends a run-local
    eval.csv row with input columns, and best.json + checkpoints_best track
    the best held-out PSNR."""
    from splatformer_tpu.training import checkpoints as ckpt_lib
    from splatformer_tpu.training.loop import run_training

    out_dir = str(tmp_path / "run_evalcsv")
    run_training(tiny_cfg, out_dir, max_steps=5)

    csv_path = os.path.join(out_dir, "eval.csv")
    assert os.path.exists(csv_path)
    with open(csv_path) as f:
        rows = [l.strip().split(",") for l in f if l.strip()]
    assert rows[0] == ["dataset", "step", "psnr", "ssim", "lpips",
                      "input_psnr", "input_ssim", "input_lpips"]
    assert len(rows) >= 3  # header + evals at steps 2 and 4
    for row in rows[1:]:
        assert row[0] == "synthetic"
        assert np.isfinite(float(row[2])) and np.isfinite(float(row[5]))

    # per-eval input metrics JSON exists and is keyed by scene name
    mi = glob.glob(os.path.join(out_dir, "eval", "synthetic", "*",
                                "metrics_input.rank0.json"))
    assert mi
    with open(mi[0]) as f:
        by_scene = json.load(f)
    assert all(k.startswith("scene") for k in by_scene)

    # best tracking
    with open(os.path.join(out_dir, "best.json")) as f:
        best = json.load(f)
    assert best["step"] in (2, 4) and np.isfinite(best["psnr"])
    assert ckpt_lib.latest_step(
        os.path.join(out_dir, "checkpoints_best")) == best["step"]
