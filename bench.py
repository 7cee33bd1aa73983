"""Benchmark: rasterizer fwd+bwd throughput AND full train-step throughput
on one chip, with an XLA-cost-analysis roofline (BASELINE.json metric line:
"rasterize Mrays/s/chip + train iters/s").

Prints the result as JSON lines {"metric", "value", "unit", "vs_baseline",
"extra"}: one line immediately after the rasterizer section (so a timeout
still leaves a parseable metric) and the authoritative final line after the
train-step section — the headline stays rasterizer Mrays/s; train iters/s,
MFU and bandwidth-utilization estimates ride in "extra". All progress goes
to stderr. The reference publishes no wall-clock throughput (BASELINE.md),
so vs_baseline reports against the fixed target 1.0 (informational). See
PERF.md for the committed breakdown.

Compiles go through the persistent cache (.jax_cache, same as train.py) —
run scripts/prewarm_bench.sh once after kernel changes so the driver's
timed run pays seconds, not the ~14-minute remote TPU compile.
"""
import json
import os
import sys
import time

import numpy as np

import jax

# persistent compile cache: the rasterizer fwd+bwd compile is minutes-long
# through the remote TPU tunnel (BENCH_r02: 827 s); reuse it across runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

# TPU v5e (v5 lite) peaks: 197 TFLOP/s bf16, 819 GB/s HBM.
# XLA cost analysis reports logical flops/bytes — utilization numbers are
# estimates, good to ~2x (fusion dedups HBM traffic; flops ignore masks).
PEAK_FLOPS = {"bf16": 197e12, "f32": 98.5e12}
PEAK_HBM = 819e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def roofline(compiled, dt, peak_flops):
    c = compiled.cost_analysis() or {}
    flops = float(c.get("flops", 0.0))
    byts = float(c.get("bytes accessed", 0.0))
    # post-fusion byte model from the optimized HLO: each top-level
    # instruction's operands + outputs, counted once (VERDICT r4 weak #4:
    # the logical per-op count put train-step hbm_utilization at 1.13 —
    # above 1 — because ops inside fusions re-count tensors that never
    # touch HBM). Utilization and speed-of-light use the fused model;
    # the logical count stays for reference.
    from splatformer_tpu.utils.hbm_model import fused_hbm_bytes
    fused = fused_hbm_bytes(compiled) or byts
    comp_t = flops / peak_flops
    mem_t = fused / PEAK_HBM
    util_raw = fused / dt / PEAK_HBM
    out = {
        "gflops_per_step": round(flops / 1e9, 2),
        "hbm_gb_logical": round(byts / 1e9, 3),
        "hbm_gb_fused": round(fused / 1e9, 3),
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "achieved_hbm_gbps": round(fused / dt / 1e9, 1),
        "mfu": round(flops / dt / peak_flops, 4),
        "hbm_utilization": round(min(util_raw, 1.0), 4),
        "bound": "memory" if mem_t > comp_t else "compute",
        "speed_of_light_ms": round(max(mem_t, comp_t) * 1e3, 2),
        "measured_ms": round(dt * 1e3, 2),
    }
    if util_raw > 1.0:
        # implied bandwidth above the physical peak proves the byte model
        # OVERCOUNTS (XLA keeps some inter-op buffers VMEM-resident, which
        # no HLO-text model can see): the step runs at or inside its real
        # memory roofline; report the raw figure for transparency
        out["hbm_utilization_raw"] = round(util_raw, 4)
        out["byte_model"] = ("overcounts: implied bandwidth exceeds the "
                             "physical peak; step is at/inside the memory "
                             "roofline")
    return out


def bench_rasterizer(n_gauss, hw, views=4):
    from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
    from splatformer_tpu.ops.render import render_images
    from splatformer_tpu.ops.types import RasterizeConfig

    rng = np.random.default_rng(0)
    scene = random_scene(rng, n_gauss, sh_degree=1)
    cameras = orbit_cameras(views, hw, hw)
    background = jnp.zeros(3)
    target = jnp.asarray(rng.uniform(size=(views, hw, hw, 3)), jnp.float32)
    rcfg = RasterizeConfig()

    attrs = ("means", "scales", "quats", "opacities", "features_dc",
             "features_rest")
    params = {k: getattr(scene, k) for k in attrs}

    @jax.jit
    def fwd_bwd(params):
        def loss(p):
            rgb, _ = render_images(scene.replace(**p), cameras, background,
                                   rcfg)
            return jnp.mean(jnp.abs(rgb - target))
        return jax.value_and_grad(loss)(params)

    t0 = time.perf_counter()
    l, g = fwd_bwd(params)
    jax.block_until_ready(g)
    log(f"rasterizer compile+1st: {time.perf_counter() - t0:.1f}s")

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        l, g = fwd_bwd(params)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters

    rays = views * hw * hw
    rf = roofline(fwd_bwd.lower(params).compile(), dt, PEAK_FLOPS["f32"])
    return rays / dt / 1e6, rf


def bench_train_step(n, hw, views=4):
    from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
    from splatformer_tpu.models.feature_predictor import FeaturePredictor
    from splatformer_tpu.ops.types import RasterizeConfig
    from splatformer_tpu.parallel.mesh import make_mesh, shard_batch
    from splatformer_tpu.training.optim import build_optimizer
    from splatformer_tpu.training.train_step import (SceneBatch, init_state,
                                                     make_train_step)

    rng = np.random.default_rng(0)
    n_pad = ((n + 1023) // 1024) * 1024
    scene = random_scene(rng, n_pad, sh_degree=1, n_valid=n)
    model = FeaturePredictor(backbone_type="PT", sh_degree=1,
                             grid_resolution=384,
                             res_feature_activation={"means": "tanh"},
                             bn_axis_name="data",
                             compute_dtype="bfloat16")
    tx = build_optimizer(
        model.init(jax.random.key(0), scene, False)["params"],
        lr_dict={"base": 1e-4, "backbone": 3e-5}, total_steps=100)
    state = init_state(model, tx, scene, jax.random.key(0))

    cams = orbit_cameras(views, hw, hw)
    batch = SceneBatch(
        scene=scene, cameras=cams,
        images=jnp.asarray(rng.uniform(size=(views, hw, hw, 3)), jnp.float32),
        background=jnp.zeros(3))
    batch = jax.tree.map(lambda a: jnp.asarray(a)[None], batch)

    mesh = make_mesh(n_devices=1)
    batch = shard_batch(mesh, batch)
    step = make_train_step(model, tx, mesh, RasterizeConfig())

    t0 = time.perf_counter()
    compiled = step.lower(state, batch, jax.random.key(1)).compile()
    log(f"train-step compile: {time.perf_counter() - t0:.1f}s")
    state, metrics = step(state, batch, jax.random.key(1))
    jax.block_until_ready(metrics)
    # a second compile fires on the first donated-device-array call (remote
    # compile through the axon tunnel); absorb it before timing
    for i in range(3):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.key(100 + i))
        float(metrics["total_loss"])
        log(f"train warmup {i}: {time.perf_counter() - t0:.2f}s")

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.key(i))
    float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / iters
    rf = roofline(compiled, dt, PEAK_FLOPS["bf16"])
    return 1.0 / dt, rf


def result_line(mrays, rf_raster, extra_train=None, partial=False, **cfg):
    extra = {"rasterizer_roofline": rf_raster, "config": cfg}
    if extra_train:
        extra.update(extra_train)
    if partial:
        # two-line stdout contract (ADVICE r3): the eager line is tagged so
        # a first-line parser can tell it lacks the train-step metrics; the
        # LAST line is always the authoritative complete result
        extra["partial"] = True
    return json.dumps({
        "metric": "rasterize_fwd_bwd_mrays_per_s_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": 1.0,
        "extra": extra,
    })


def main():
    n_gauss = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = {"n_gauss": n_gauss, "hw": hw, "views": 4,
           "model": "ptv3_base bf16"}

    mrays, rf_raster = bench_rasterizer(n_gauss, hw)
    log(f"rasterizer: {mrays:.3f} Mrays/s  roofline: {rf_raster}")
    # eager partial line: a timeout in the train-step section still leaves
    # the headline metric parseable (BENCH_r02 lost everything to rc=124)
    print(result_line(mrays, rf_raster, partial=True, **cfg), flush=True)

    iters_s, rf_train = bench_train_step(n_gauss, hw)
    log(f"train step: {iters_s:.3f} iters/s  roofline: {rf_train}")

    # authoritative final line (parsers taking either first or last line of
    # stdout get a valid result)
    print(result_line(mrays, rf_raster, extra_train={
        "train_step_iters_per_s_per_chip": round(iters_s, 3),
        "train_step_roofline": rf_train,
    }, **cfg), flush=True)


if __name__ == "__main__":
    main()
