"""Flash-attention path parity (VERDICT round-1 item: the TPU-only flash
branch had no test).

The bundled Pallas TPU kernel cannot lower on CPU, but it ships its own
`mha_reference`; these tests pin, on CPU:
  1. our einsum attention == mha_reference under the same sm_scale
     convention (so swapping one for the other on TPU is a no-op);
  2. the head-dim zero-pad to 128 used by the flash branch is mathematically
     lossless (extra k dims add 0 logits, extra v dims are sliced away);
  3. the module-level use_flash=False output equals use_flash=None on CPU
     (auto never picks flash off-TPU).

The compiled kernel itself is validated on the chip by
tools/validate_tpu.py (flash vs einsum on the real TPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu import flash_attention as fa

from splatformer_tpu.models.point import make_point_batch
from splatformer_tpu.models.ptv3 import SerializedAttention


def _einsum_attn(q, k, v, scale):
    """The module's einsum path, verbatim convention."""
    attn = jnp.einsum("bhqc,bhkc->bhqk", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkc->bhqc", attn, v,
                      preferred_element_type=jnp.float32)


def test_einsum_matches_mha_reference(rng):
    b, h, k, c = 2, 2, 256, 32
    q, kk, v = (jnp.asarray(rng.normal(size=(b, h, k, c)), jnp.float32)
                for _ in range(3))
    scale = c ** -0.5
    ours = _einsum_attn(q, kk, v, scale)
    ref = fa.mha_reference(q, kk, v, None, sm_scale=scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_head_dim_pad_is_lossless(rng):
    """The flash branch pads ch to 128 lanes; padding q/k with zeros leaves
    logits unchanged and padded v dims are sliced off."""
    b, h, k, c = 1, 2, 256, 16
    q, kk, v = (jnp.asarray(rng.normal(size=(b, h, k, c)), jnp.float32)
                for _ in range(3))
    scale = c ** -0.5
    d_pad = 128
    padw = ((0, 0), (0, 0), (0, 0), (0, d_pad - c))
    qf, kf, vf = (jnp.pad(t, padw) for t in (q, kk, v))
    padded = fa.mha_reference(qf, kf, vf, None, sm_scale=scale)[..., :c]
    plain = _einsum_attn(q, kk, v, scale)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(plain),
                               rtol=2e-5, atol=2e-6)


def test_use_flash_false_equals_auto_on_cpu(rng):
    n, c = 512, 16
    coord = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    pb = make_point_batch(coord, feat, jnp.ones(n, bool), grid_resolution=32)

    def run(use_flash):
        attn = SerializedAttention(channels=c, num_heads=2, patch_size=256,
                                   order_index=0, use_flash=use_flash)
        params = attn.init(jax.random.key(0), feat, pb, False)
        return attn.apply(params, feat, pb, False)

    np.testing.assert_allclose(np.asarray(run(False)), np.asarray(run(None)))
