"""Token merging inside serialized patch attention — the fork's efficiency
study (SURVEY.md §0, §2.4; hook semantics at /root/reference/visualize.py:157-198
and configs/model/ptv3_{tome,pitome,tofu,prune,patch,wpatch,algm}.gin).

Contract (mirrors the fork's `process_merging`): given per-patch q/k/v of
shape (B, H, K, c) and a merge ratio r, return reduced (B, H, K', c) tensors,
a `size` tensor (B, H, K', 1) counting how many original tokens each reduced
token represents (used as proportional attention `attn + log(size)`), and an
`unmerge` closure scattering reduced features back to (B, H, K, c)
(`process_unreduction`).

TPU design notes: K and the merge count are static (r is a config constant),
so every mode compiles to fixed-shape gathers + one-hot matmuls — no dynamic
token counts. The Pointcept-fork submodule is not present in the reference
snapshot (SURVEY.md §0), so each algorithm follows its published definition:
ToMe (Bolya et al. 2023 bipartite soft matching), PiToMe (energy-based
protective merging), ToFu (norm-preserving fusion), importance pruning,
stride patch pooling (+ weighted / important / random block variants), and
ALGM-style threshold-gated adjacent merging.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

MERGE_MODES = ("tome", "tofu", "pitome", "prune", "patch", "wpatch", "algm",
               "progressive", "random_patch", "important_patch")


def needs_rng(mode: str, info: Dict[str, Any]) -> bool:
    return mode == "random_patch" and not info.get("no_rand", False)


def _normalize(x, eps=1e-6):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def _merge_count(k: int, r: float) -> int:
    return max(0, min(k // 2, int(k * r)))


# ---------------------------------------------------------------------------
# bipartite soft matching (ToMe) and relatives
# ---------------------------------------------------------------------------

def _bipartite(metric: jnp.ndarray, r_count: int, fuse: str = "mean",
               src_protect: Optional[jnp.ndarray] = None):
    """metric (B, H, K, c). Returns (merge_fn, unmerge_fn, size).

    Alternating split: src = even positions, dst = odd positions. The
    r_count most-similar src tokens are merged into their best dst.
    Output layout: [kept src (K/2 - r), dst (K/2)] -> K' = K - r.

    ``src_protect`` (half,) bool marks src slots that must never merge
    (PiToMe protected tokens): their match score ranks last, and the caller
    keeps r_count below the unprotected count.
    """
    b, h, k, c = metric.shape
    half = k // 2
    r_count = min(r_count, half)
    kn = _normalize(metric)
    src, dst = kn[..., 0::2, :], kn[..., 1::2, :]
    scores = jnp.einsum("bhsc,bhdc->bhsd", src, dst,
                        preferred_element_type=jnp.float32)
    best = jnp.max(scores, axis=-1)                  # (B, H, half)
    best_dst = jnp.argmax(scores, axis=-1)           # (B, H, half)
    if src_protect is not None:
        best = jnp.where(src_protect[None, None, :], -jnp.inf, best)
    order = jnp.argsort(-best, axis=-1)              # src ranks, merged first
    merged_rank = order[..., :r_count]               # (B, H, r)
    kept_rank = order[..., r_count:]                 # (B, H, half - r)

    is_merged = jnp.zeros((b, h, half), bool)
    is_merged = jax.vmap(jax.vmap(
        lambda m, idx: m.at[idx].set(True)))(is_merged, merged_rank)
    # one-hot routing of merged src into dst rows
    route = jax.nn.one_hot(best_dst, half, dtype=metric.dtype)  # (B,H,half,half)
    route = route * is_merged[..., None].astype(metric.dtype)
    counts = jnp.sum(route, axis=-2)                 # (B, H, half) extra per dst
    size_dst = 1.0 + counts
    size_kept = jnp.ones((b, h, half - r_count), metric.dtype)
    size = jnp.concatenate([size_kept, size_dst], axis=-1)[..., None]

    def merge(x, weights: Optional[jnp.ndarray] = None):
        xs, xd = x[..., 0::2, :], x[..., 1::2, :]
        add = jnp.einsum("bhsd,bhsc->bhdc", route, xs,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if fuse == "mean":
            xd_m = (xd + add) / size_dst[..., None]
        elif fuse == "sum":
            xd_m = xd + add
        elif fuse == "norm":  # ToFu: mean direction, max magnitude preserved
            mean = (xd + add) / size_dst[..., None]
            norm_d = jnp.linalg.norm(xd, axis=-1)
            merged_max = jnp.einsum(
                "bhsd,bhs->bhd", route, jnp.linalg.norm(xs, axis=-1))
            target = jnp.maximum(norm_d, merged_max)
            mean_n = jnp.linalg.norm(mean, axis=-1) + 1e-6
            xd_m = mean * (target / mean_n)[..., None]
        else:
            raise ValueError(fuse)
        kept = jnp.take_along_axis(xs, kept_rank[..., None], axis=-2)
        return jnp.concatenate([kept, xd_m], axis=-2)

    def unmerge(y):
        kept_y = y[..., : half - r_count, :]
        dst_y = y[..., half - r_count:, :]
        # src slots: kept ones take their row; merged ones copy their dst row
        src_y = jnp.einsum("bhsd,bhdc->bhsc", route, dst_y,
                           preferred_element_type=jnp.float32).astype(y.dtype)
        src_y = jax.vmap(jax.vmap(
            lambda s, idx, vals: s.at[idx].set(vals)))(src_y, kept_rank, kept_y)
        out = jnp.zeros(y.shape[:2] + (k, y.shape[-1]), y.dtype)
        out = out.at[..., 0::2, :].set(src_y)
        out = out.at[..., 1::2, :].set(dst_y)
        return out

    return merge, unmerge, size


# ---------------------------------------------------------------------------
# block/patch pooling variants
# ---------------------------------------------------------------------------

def _patch_blocks(metric: jnp.ndarray, r_count: int, stride: int,
                  select: str, rng: Optional[jax.Array],
                  weighted: bool):
    """Merge whole contiguous blocks of `stride` tokens into single tokens.

    K tokens -> K/g blocks (g = stride). `n_merge_blocks` blocks (chosen by
    `select`: 'first' | 'important' | 'random') are pooled to one token each;
    the rest stay. K' = K - n_merge_blocks * (g - 1).
    """
    b, h, k, c = metric.shape
    g = max(2, min(stride, k))
    while k % g != 0:
        g -= 1
    nb = k // g
    n_merge = min(nb, r_count // (g - 1)) if g > 1 else 0
    kp = k - n_merge * (g - 1)

    blocks = metric.reshape(b, h, nb, g, c)
    if select == "important":
        # blocks with lowest internal variance merged first (most redundant)
        var = jnp.sum(jnp.var(blocks, axis=-2), axis=-1)  # (B, H, nb)
        order = jnp.argsort(var, axis=-1)
    elif select == "random":
        if rng is None:
            order = jnp.broadcast_to(jnp.arange(nb), (b, h, nb))
        else:
            scores = jax.random.uniform(rng, (b, h, nb))
            order = jnp.argsort(scores, axis=-1)
    else:  # 'first'
        order = jnp.broadcast_to(jnp.arange(nb), (b, h, nb))
    merge_blocks = order[..., :n_merge]             # (B, H, n_merge)
    keep_blocks = jnp.sort(order[..., n_merge:], axis=-1)

    if weighted:
        centroid = jnp.mean(blocks, axis=-2, keepdims=True)
        w = jnp.einsum("bhngc,bhnoc->bhng", _normalize(blocks),
                       _normalize(centroid))
        w = jax.nn.softmax(w, axis=-1)[..., None]    # (B, H, nb, g, 1)
    else:
        w = jnp.full((b, h, nb, g, 1), 1.0 / g, metric.dtype)

    size_merged = jnp.full((b, h, n_merge), float(g), metric.dtype)
    size_kept = jnp.ones((b, h, (nb - n_merge) * g), metric.dtype)
    size = jnp.concatenate([size_kept, size_merged], axis=-1)[..., None]

    def merge(x, weights=None):
        xb = x.reshape(b, h, nb, g, x.shape[-1])
        pooled = jnp.sum(xb * w, axis=-2)            # (B, H, nb, c)
        m = jnp.take_along_axis(pooled, merge_blocks[..., None], axis=-2)
        kept = jnp.take_along_axis(
            xb, keep_blocks[..., None, None].repeat(g, -2), axis=-3)
        kept = kept.reshape(b, h, (nb - n_merge) * g, x.shape[-1])
        return jnp.concatenate([kept, m], axis=-2)

    def unmerge(y):
        kept = y[..., : (nb - n_merge) * g, :].reshape(
            b, h, nb - n_merge, g, y.shape[-1])
        m = y[..., (nb - n_merge) * g:, :]           # (B, H, n_merge, c)
        out_blocks = jnp.zeros((b, h, nb, g, y.shape[-1]), y.dtype)
        out_blocks = jax.vmap(jax.vmap(
            lambda ob, idx, vals: ob.at[idx].set(vals)))(
                out_blocks, keep_blocks, kept)
        m_expand = jnp.repeat(m[..., None, :], g, axis=-2)
        out_blocks = jax.vmap(jax.vmap(
            lambda ob, idx, vals: ob.at[idx].set(vals)))(
                out_blocks, merge_blocks, m_expand)
        return out_blocks.reshape(b, h, k, y.shape[-1])

    return merge, unmerge, size, kp


# ---------------------------------------------------------------------------
# pruning
# ---------------------------------------------------------------------------

def _prune(metric: jnp.ndarray, r_count: int):
    """Keep the K - r most salient tokens (similarity-to-mean importance);
    pruned slots unmerge by copying their nearest kept token's feature."""
    b, h, k, c = metric.shape
    kp = k - min(r_count, k - 1)
    kn = _normalize(metric)
    centroid = _normalize(jnp.mean(kn, axis=-2, keepdims=True))
    # least-redundant tokens kept: low similarity to centroid = distinctive
    redundancy = jnp.einsum("bhkc,bhoc->bhk", kn, centroid)
    order = jnp.argsort(redundancy, axis=-1)         # ascending: keep first kp
    keep = jnp.sort(order[..., :kp], axis=-1)
    sim_all = jnp.einsum("bhkc,bhqc->bhkq", kn,
                         jnp.take_along_axis(kn, keep[..., None], -2))
    nearest_kept = jnp.argmax(sim_all, axis=-1)      # (B, H, K) index into kept

    size = jnp.ones((b, h, kp, 1), metric.dtype)

    def merge(x, weights=None):
        return jnp.take_along_axis(x, keep[..., None], axis=-2)

    def unmerge(y):
        return jnp.take_along_axis(y, nearest_kept[..., None], axis=-2)

    return merge, unmerge, size


# ---------------------------------------------------------------------------
# PiToMe — energy-gated bipartite merging with protected tokens
# ---------------------------------------------------------------------------

def _pitome(metric: jnp.ndarray, r_count: int, margin: float, alpha: float,
            protected_ratio: float = 0.0):
    b, h, k, c = metric.shape
    kn = _normalize(metric)
    sim = jnp.einsum("bhkc,bhqc->bhkq", kn, kn)
    f = jnp.where(sim >= margin, sim, alpha * (jnp.exp(sim - margin) - 1.0))
    energy = jnp.mean(f, axis=-1)                    # (B, H, K)
    # high-energy (redundant) tokens become merge candidates: reorder tokens
    # by energy desc, run bipartite matching in that order.
    order = jnp.argsort(-energy, axis=-1)
    inv = jnp.argsort(order, axis=-1)
    metric_sorted = jnp.take_along_axis(metric, order[..., None], axis=-2)
    # protected tokens (lowest energy = most distinctive) occupy the LAST
    # ceil(p * K) sorted positions — statically known, so protection is a
    # fixed slot mask + a cap on the merge count
    src_protect = None
    if protected_ratio > 0.0:
        import numpy as _np
        n_p = int(_np.ceil(protected_ratio * k))
        prot = _np.arange(k) >= k - n_p
        src_protect = jnp.asarray(prot[0::2])
        r_count = min(r_count, k // 2 - int(prot[0::2].sum()))
    merge_b, unmerge_b, size = _bipartite(metric_sorted, r_count,
                                          src_protect=src_protect)

    def merge(x, weights=None):
        xs = jnp.take_along_axis(x, order[..., None], axis=-2)
        return merge_b(xs)

    def unmerge(y):
        out_sorted = unmerge_b(y)
        return jnp.take_along_axis(out_sorted, inv[..., None], axis=-2)

    return merge, unmerge, size


# ---------------------------------------------------------------------------
# ALGM-style threshold-gated adjacent merging
# ---------------------------------------------------------------------------

def _algm(metric: jnp.ndarray, r_count: int, threshold: float):
    """Merge adjacent serialized token pairs whose cosine similarity exceeds
    ``threshold`` (ALGM's local-merging criterion), capped at ``r_count``
    merges (the reference's ``r`` knob; 0 means uncapped).

    TPU-static formulation: the number of qualifying pairs is data-dependent,
    so instead of compacting to a dynamic K' this keeps K' = K and *masks*
    merged-away odd slots with ``size = 0`` — proportional attention
    (``attn + log(size)``) then removes them from every softmax exactly, and
    ``unmerge`` restores them from their pair head. Quality semantics match
    the dynamic-shape original; attention FLOPs stay at K (the static-shape
    price; effective tokens = ``sum(size > 0)``).
    """
    b, h, k, c = metric.shape
    half = k // 2
    kn = _normalize(metric)
    even, odd = kn[..., 0::2, :], kn[..., 1::2, :]
    sim = jnp.sum(even * odd, axis=-1)               # (B, H, half)
    qualifies = sim >= threshold
    if r_count > 0:
        rc = min(r_count, half)
        # cap: only the top-rc qualifying pairs (by similarity) merge
        gated = jnp.where(qualifies, sim, -jnp.inf)
        order = jnp.argsort(-gated, axis=-1)
        rank = jnp.argsort(order, axis=-1)           # rank of each pair
        qualifies = qualifies & (rank < rc)
    mf = qualifies.astype(metric.dtype)[..., None]   # (B, H, half, 1)

    size = jnp.zeros((b, h, k, 1), metric.dtype)
    size = size.at[..., 0::2, :].set(1.0 + mf)
    size = size.at[..., 1::2, :].set(1.0 - mf)

    def merge(x, weights=None):
        xe, xo = x[..., 0::2, :], x[..., 1::2, :]
        mean = 0.5 * (xe + xo)
        ye = jnp.where(mf > 0, mean, xe)
        yo = jnp.where(mf > 0, jnp.zeros_like(xo), xo)   # dead slot
        out = jnp.zeros_like(x)
        out = out.at[..., 0::2, :].set(ye)
        out = out.at[..., 1::2, :].set(yo)
        return out

    def unmerge(y):
        ye, yo = y[..., 0::2, :], y[..., 1::2, :]
        out = jnp.zeros_like(y)
        out = out.at[..., 0::2, :].set(ye)
        out = out.at[..., 1::2, :].set(jnp.where(mf > 0, ye, yo))
        return out

    return merge, unmerge, size


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def build_merge(mode: str, metric: jnp.ndarray, info: Dict[str, Any],
                rng: Optional[jax.Array] = None
                ) -> Tuple[Callable, Callable, jnp.ndarray]:
    """Build (merge, unmerge, size) from a similarity metric (B, H, K, c) —
    the same partition can then merge q/k/v/coords consistently (the
    reference hook's `merge(coords)`, visualize.py:163-166)."""
    kk = metric.shape[-2]
    r = float(info.get("r", 0.0) or 0.0)
    r_count = _merge_count(kk, r)
    if info.get("single_head_tome"):
        metric = jnp.mean(metric, axis=1, keepdims=True).repeat(
            metric.shape[1], 1)

    if mode in ("tome", "progressive"):
        merge, unmerge, size = _bipartite(metric, r_count, fuse="mean")
    elif mode == "tofu":
        merge, unmerge, size = _bipartite(metric, r_count, fuse="norm")
    elif mode == "pitome":
        merge, unmerge, size = _pitome(
            metric, r_count, margin=float(info.get("margin", 0.9)),
            alpha=float(info.get("alpha", 1.0)),
            protected_ratio=float(info.get("protected_ratio", 0.0)))
    elif mode == "prune":
        merge, unmerge, size = _prune(metric, r_count)
    elif mode in ("patch", "wpatch", "random_patch", "important_patch"):
        stride = int(info.get("stride", 10))
        if mode == "wpatch":
            # low_r: minimum tokens that must survive
            low_r = int(info.get("low_r", 16))
            r_count = min(r_count, max(0, kk - low_r))
        select = {"patch": "first", "wpatch": "first",
                  "random_patch": "random",
                  "important_patch": "important"}[mode]
        merge, unmerge, size, _ = _patch_blocks(
            metric, r_count, stride, select, rng, weighted=(mode == "wpatch"))
    elif mode == "algm":
        merge, unmerge, size = _algm(
            metric, r_count, threshold=float(info.get("threshold", 0.9)))
    else:
        raise NotImplementedError(mode)

    return merge, unmerge, size


def process_merging(mode: str, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    info: Dict[str, Any], rng: Optional[jax.Array] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                               jnp.ndarray, Callable]:
    """Returns (q', k', v', size, unmerge). `size` feeds proportional
    attention; `unmerge` maps (B, H, K', c) back to (B, H, K, c)."""
    merge, unmerge, size = build_merge(mode, k, info, rng=rng)
    return merge(q), merge(k), merge(v), size, unmerge
