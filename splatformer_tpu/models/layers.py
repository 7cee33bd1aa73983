"""Shared flax layers: masked BatchNorm (with optional cross-replica sync),
per-point DropPath, MLP.

The reference backbone uses BatchNorm1d(eps=1e-3, momentum=0.01) over the
point axis, converted to SyncBatchNorm under DDP (/root/reference/train.py:404,
models/pointtransformer_v3.py:252). Here batch statistics are computed over
*valid* points only (padding excluded) and optionally `pmean`-reduced over a
mesh axis — the pjit-native SyncBN.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the point axis with a validity mask.

    momentum semantics match torch: new = (1 - momentum) * old + momentum * batch.
    Running var uses the unbiased batch variance like torch BatchNorm1d.
    """

    momentum: float = 0.01
    eps: float = 1e-3
    axis_name: Optional[str] = None
    # turn_off_bn escape hatch (/root/reference/models/pointtransformer_v3.py:
    # 249-251: bn_layer = nn.Identity) — no params, no statistics
    off: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        if self.off:
            return x
        c = x.shape[-1]
        in_dtype = x.dtype
        x = x.astype(jnp.float32)  # statistics always in f32 (bf16 compute)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            m = mask.astype(x.dtype)[:, None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=0) / cnt
            var = jnp.sum(jnp.square(x - mean) * m, axis=0) / cnt
            if self.axis_name is not None:
                # cross-replica (SyncBN): weight by per-replica valid counts
                total = jax.lax.psum(cnt, self.axis_name)
                mean_g = jax.lax.psum(mean * cnt, self.axis_name) / total
                # E[x^2] trick for a single psum round
                ex2 = jax.lax.psum((var + jnp.square(mean)) * cnt,
                                   self.axis_name) / total
                var_g = ex2 - jnp.square(mean_g)
                mean, var, cnt = mean_g, var_g, total
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = ((1.0 - self.momentum) * ra_mean.value
                                 + self.momentum * mean.astype(jnp.float32))
                ra_var.value = ((1.0 - self.momentum) * ra_var.value
                                + self.momentum * unbiased.astype(jnp.float32))
        else:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(in_dtype)


class DropPath(nn.Module):
    """Stochastic depth on the residual branch, per point (timm DropPath on a
    (N, C) tensor treats dim 0 as the batch — reference
    models/pointtransformer_v3.py:18 usage)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if not train or self.rate == 0.0:
            return x
        rng = self.make_rng("droppath")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask.astype(x.dtype) / keep


class Mlp(nn.Module):
    """PTv3 block MLP: Dense -> GELU -> Dense (hidden = ratio * channels)."""

    hidden: int
    out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        return x
