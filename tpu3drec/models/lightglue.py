"""LightGlue attention matcher in Flax/XLA.

TPU-native replacement for the reference's torch LightGlue matcher
(feature_matchers.py:255-549). Architecture follows the LightGlue paper
(arXiv 2306.13643, listed in PAPERS.md): descriptors are projected to a
common width, then N transformer layers alternate self-attention (with 2-D
rotary positional encoding of the normalized keypoint locations) and
bidirectional cross-attention; a final matchability head (sigma) and a
similarity head feed the double-softmax log-assignment with matchability
gating. The adaptive depth/width pruning of the paper is intentionally
dropped: on TPU, static shapes + full-depth execution compile to one fused
program that is faster than data-dependent early exits.

Pretrained weights cannot be fetched in this environment; the module runs
with random init for functional tests and provides the same assignment
semantics (mutual argmax + threshold) the reference filters on
(feature_matchers.py:434-540).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpu3drec.core.types import Features, Matches, ScoreType


def rotary_embed_2d(xy_norm: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(N, 2) normalized coords -> (N, dim/2) angles for 2-D rotary PE."""
    n_freq = dim // 4
    freqs = jnp.exp(jnp.linspace(0.0, np.log(32.0), n_freq))
    ang_x = xy_norm[:, 0:1] * freqs[None]   # (N, F)
    ang_y = xy_norm[:, 1:2] * freqs[None]
    return jnp.concatenate([ang_x, ang_y], axis=1)  # (N, dim/2)


def apply_rotary(x: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotate feature pairs by position-dependent angles. x: (N, D)."""
    n, d = x.shape
    x2 = x.reshape(n, d // 2, 2)
    c = jnp.cos(angles)[..., None]
    s = jnp.sin(angles)[..., None]
    rot = jnp.concatenate([
        x2[..., :1] * c - x2[..., 1:] * s,
        x2[..., :1] * s + x2[..., 1:] * c,
    ], axis=-1)
    return rot.reshape(n, d)


class Attention(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, q_feats, kv_feats, q_angles=None, kv_angles=None):
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, name="q")(q_feats)
        k = nn.Dense(self.dim, name="k")(kv_feats)
        v = nn.Dense(self.dim, name="v")(kv_feats)
        if q_angles is not None:
            # rotary_embed_2d yields dim/2 angles = one per feature pair
            q = apply_rotary(q, q_angles)
            k = apply_rotary(k, kv_angles)
        q = q.reshape(-1, self.heads, hd)
        k = k.reshape(-1, self.heads, hd)
        v = v.reshape(-1, self.heads, hd)
        att = jnp.einsum("nhd,mhd->hnm", q, k) / np.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("hnm,mhd->nhd", att, v).reshape(-1, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class GlueLayer(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, d0, d1, ang0, ang1):
        # self attention (rotary PE)
        s = Attention(self.dim, self.heads, name="self_attn")
        d0 = d0 + s(d0, d0, ang0, ang0)
        d1 = d1 + s(d1, d1, ang1, ang1)
        m0 = nn.Sequential([nn.Dense(2 * self.dim), nn.gelu,
                            nn.Dense(self.dim)])
        d0 = d0 + m0(nn.LayerNorm()(d0))
        d1 = d1 + m0(nn.LayerNorm()(d1))
        # cross attention (no PE — positions are view-specific)
        c = Attention(self.dim, self.heads, name="cross_attn")
        d0n, d1n = d0, d1
        d0 = d0 + c(d0n, d1n)
        d1 = d1 + c(d1n, d0n)
        m1 = nn.Sequential([nn.Dense(2 * self.dim), nn.gelu,
                            nn.Dense(self.dim)])
        d0 = d0 + m1(nn.LayerNorm()(d0))
        d1 = d1 + m1(nn.LayerNorm()(d1))
        return d0, d1


class LightGlueNet(nn.Module):
    dim: int = 256
    n_layers: int = 9
    heads: int = 4

    @nn.compact
    def __call__(self, desc0, desc1, xy0, xy1, mask0, mask1):
        """Returns (log_assignment (N+1, M+1), sim, sigma0, sigma1)."""
        in_proj = nn.Dense(self.dim, name="input_proj")  # shared across views
        d0 = in_proj(desc0)
        d1 = in_proj(desc1)
        ang0 = rotary_embed_2d(xy0, self.dim)
        ang1 = rotary_embed_2d(xy1, self.dim)
        for i in range(self.n_layers):
            d0, d1 = GlueLayer(self.dim, self.heads, name=f"layer{i}")(
                d0, d1, ang0, ang1)
        # heads
        final = nn.Dense(self.dim, name="final_proj")  # shared across views
        f0 = final(d0)
        f1 = final(d1)
        sim = jnp.einsum("nd,md->nm", f0, f1) / np.sqrt(self.dim)
        sigma0 = jax.nn.sigmoid(nn.Dense(1, name="match0")(d0))[:, 0]
        sigma1 = jax.nn.sigmoid(nn.Dense(1, name="match1")(d1))[:, 0]
        # mask padded rows out of the softmaxes
        neg = jnp.float32(-1e9)
        sim = jnp.where(mask0[:, None], sim, neg)
        sim = jnp.where(mask1[None, :], sim, neg)
        # double-softmax log assignment with matchability (LightGlue eq. 8)
        log_a0 = jax.nn.log_softmax(sim, axis=1)
        log_a1 = jax.nn.log_softmax(sim, axis=0)
        log_assign = (log_a0 + log_a1
                      + jnp.log(jnp.maximum(sigma0, 1e-9))[:, None]
                      + jnp.log(jnp.maximum(sigma1, 1e-9))[None, :])
        return log_assign, sim, sigma0, sigma1


class LightGlue:
    """Inference wrapper producing Matches with CONFIDENCE scores."""

    def __init__(self, params: Optional[Dict] = None, dim: int = 256,
                 n_layers: int = 9, input_dim: int = 256):
        self.net = LightGlueNet(dim=dim, n_layers=n_layers)
        self.params = params
        self.input_dim = input_dim

    def init_random(self, n: int = 32, seed: int = 0) -> Dict:
        k = jax.random.PRNGKey(seed)
        d = jnp.zeros((n, self.input_dim))
        xy = jnp.zeros((n, 2))
        m = jnp.ones((n,), bool)
        self.params = self.net.init(k, d, d, xy, xy, m, m)
        return self.params

    @functools.partial(jax.jit, static_argnames=("self",))
    def _forward(self, params, d0, d1, xy0, xy1, m0, m1):
        return self.net.apply(params, d0, d1, xy0, xy1, m0, m1)

    def match(self, feats0: Features, feats1: Features,
              filter_threshold: float = 0.1) -> Matches:
        if self.params is None:
            raise RuntimeError("LightGlue weights not loaded; call "
                               "init_random() for testing")
        def norm_xy(f):
            h, w = (f.image_shape or (480, 640))[:2]
            scale = max(h, w)
            return (f.xy - jnp.asarray([w / 2, h / 2])) / scale

        log_assign, sim, s0, s1 = self._forward(
            self.params, feats0.desc, feats1.desc,
            norm_xy(feats0), norm_xy(feats1), feats0.mask, feats1.mask)
        p = jnp.exp(log_assign)
        best1 = jnp.argmax(p, axis=1)
        best0 = jnp.argmax(p, axis=0)
        n = feats0.capacity
        idx = jnp.arange(n)
        mutual = best0[best1] == idx
        conf = jnp.max(p, axis=1)
        ok = mutual & (conf > filter_threshold) & feats0.mask
        ok = ok & feats1.mask[best1]
        return Matches(
            idx1=idx.astype(jnp.int32),
            idx2=best1.astype(jnp.int32),
            score=jnp.where(ok, conf, 0.0),
            mask=ok,
            score_type=ScoreType.CONFIDENCE.value,
            method="lightglue",
        )


_LG_CACHE: Dict[int, LightGlue] = {}


def match_features_lightglue(feats0: Features, feats1: Features,
                             filter_threshold: float = 0.1) -> Matches:
    """Factory entry (core/registry.py). Loads converted weights if present,
    else raises (the registry's auto-selection then falls back to kNN)."""
    from tpu3drec.models import WEIGHTS_DIR, weights_available
    input_dim = feats0.desc.shape[1]
    if input_dim not in _LG_CACHE:
        lg = LightGlue(input_dim=input_dim)
        if weights_available("lightglue"):
            data = np.load(WEIGHTS_DIR / "lightglue.npz", allow_pickle=True)
            lg.params = jax.tree.map(jnp.asarray, data["params"].item())
        else:
            raise ImportError("lightglue weights not available")
        _LG_CACHE[input_dim] = lg
    return _LG_CACHE[input_dim].match(feats0, feats1, filter_threshold)
