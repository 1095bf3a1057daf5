"""LightGlue torch->flax converter parity.

Real checkpoints cannot be downloaded in this environment, so parity is
proven structurally: a torch mirror of the published LightGlue blocks
(cvg/LightGlue — SelfBlock with packed Wqkv + rotary learnable-Fourier
PE, CrossBlock with shared to_qk, concat-FFN with LayerNorm+exact GELU,
MatchAssignment head; arXiv 2306.13643) is initialized randomly, its
state dict converted with models.lightglue.load_torch_weights, and the
flax forward must reproduce the torch forward numerically. When a real
checkpoint is dropped into the weights dir the same converter loads it
(test_registry_gating covers the wiring)."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from tpu3drec.models.lightglue import (
    LightGlueNet, load_torch_weights, normalize_keypoints,
)

D, H, LAYERS = 64, 4, 2  # small config; architecture identical


# ---- torch mirror of cvg/LightGlue ------------------------------------

class TorchPE(nn.Module):
    def __init__(self, head_dim):
        super().__init__()
        self.Wr = nn.Linear(2, head_dim // 2, bias=False)

    def forward(self, x):
        proj = self.Wr(x)
        cos = torch.cos(proj).repeat_interleave(2, dim=-1)
        sin = torch.sin(proj).repeat_interleave(2, dim=-1)
        return cos, sin


def rotate_half(x):
    x = x.unflatten(-1, (-1, 2))
    x1, x2 = x.unbind(dim=-1)
    return torch.stack((-x2, x1), dim=-1).flatten(start_dim=-2)


def apply_rot(t, cos, sin):
    # t: (N, h, dh); cos/sin: (N, dh)
    return t * cos[:, None, :] + rotate_half(t) * sin[:, None, :]


def make_ffn(d):
    return nn.Sequential(nn.Linear(2 * d, 2 * d), nn.LayerNorm(2 * d),
                         nn.GELU(), nn.Linear(2 * d, d))


class TorchSelf(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h = h
        self.Wqkv = nn.Linear(d, 3 * d)
        self.out_proj = nn.Linear(d, d)
        self.ffn = make_ffn(d)

    def forward(self, x, cos, sin):
        n, d = x.shape
        qkv = self.Wqkv(x).unflatten(-1, (-1, self.h, 3)).permute(3, 0, 2, 1)
        q, k, v = qkv[0], qkv[1], qkv[2]       # (N, h, dh)
        q = apply_rot(q, cos, sin)
        k = apply_rot(k, cos, sin)
        dh = d // self.h
        att = torch.einsum("nhd,mhd->hnm", q, k) / math.sqrt(dh)
        att = torch.softmax(att, dim=-1)
        ctx = torch.einsum("hnm,mhd->nhd", att, v).reshape(n, d)
        msg = self.out_proj(ctx)
        return x + self.ffn(torch.cat([x, msg], -1))


class TorchCross(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h = h
        self.scale = (d // h) ** -0.25
        self.to_qk = nn.Linear(d, d)
        self.to_v = nn.Linear(d, d)
        self.to_out = nn.Linear(d, d)
        self.ffn = make_ffn(d)

    def forward(self, x0, x1):
        h = self.h
        n0, d = x0.shape
        n1 = x1.shape[0]
        qk0 = (self.to_qk(x0) * 1.0).reshape(n0, h, -1) * self.scale
        qk1 = (self.to_qk(x1) * 1.0).reshape(n1, h, -1) * self.scale
        v0 = self.to_v(x0).reshape(n0, h, -1)
        v1 = self.to_v(x1).reshape(n1, h, -1)
        sim = torch.einsum("nhd,mhd->hnm", qk0, qk1)
        m0 = torch.einsum("hnm,mhd->nhd", torch.softmax(sim, -1), v1)
        m1 = torch.einsum("hnm,nhd->mhd", torch.softmax(sim, 1), v0)
        m0 = self.to_out(m0.reshape(n0, d))
        m1 = self.to_out(m1.reshape(n1, d))
        x0 = x0 + self.ffn(torch.cat([x0, m0], -1))
        x1 = x1 + self.ffn(torch.cat([x1, m1], -1))
        return x0, x1


class TorchLayer(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.self_attn = TorchSelf(d, h)
        self.cross_attn = TorchCross(d, h)

    def forward(self, x0, x1, pe0, pe1):
        x0 = self.self_attn(x0, *pe0)
        x1 = self.self_attn(x1, *pe1)
        return self.cross_attn(x0, x1)


class TorchAssign(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.matchability = nn.Linear(d, 1)
        self.final_proj = nn.Linear(d, d)

    def forward(self, d0, d1):
        m0 = self.final_proj(d0) / d0.shape[-1] ** 0.25
        m1 = self.final_proj(d1) / d1.shape[-1] ** 0.25
        sim = m0 @ m1.T
        z0 = self.matchability(d0)[:, 0]
        z1 = self.matchability(d1)[:, 0]
        la = (F.log_softmax(sim, 1) + F.log_softmax(sim, 0)
              + F.logsigmoid(z0)[:, None] + F.logsigmoid(z1)[None, :])
        return la, sim, z0, z1


class TorchLG(nn.Module):
    def __init__(self, input_dim, d, h, n_layers):
        super().__init__()
        self.input_proj = nn.Linear(input_dim, d)
        self.posenc = TorchPE(d // h)
        self.transformers = nn.ModuleList(
            [TorchLayer(d, h) for _ in range(n_layers)])
        self.log_assignment = nn.ModuleList(
            [TorchAssign(d) for _ in range(n_layers)])

    def forward(self, desc0, desc1, xy0, xy1):
        d0 = self.input_proj(desc0)
        d1 = self.input_proj(desc1)
        pe0 = self.posenc(xy0)
        pe1 = self.posenc(xy1)
        for layer in self.transformers:
            d0, d1 = layer(d0, d1, pe0, pe1)
        return self.log_assignment[-1](d0, d1)


@pytest.fixture(scope="module")
def torch_and_flax():
    torch.manual_seed(0)
    tnet = TorchLG(input_dim=32, d=D, h=H, n_layers=LAYERS).eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = load_torch_weights(sd, n_layers=LAYERS)
    fnet = LightGlueNet(dim=D, n_layers=LAYERS, heads=H)
    return tnet, fnet, params


def test_forward_parity(torch_and_flax):
    tnet, fnet, params = torch_and_flax
    rng = np.random.default_rng(1)
    n0, n1 = 24, 31
    desc0 = rng.standard_normal((n0, 32)).astype(np.float32)
    desc1 = rng.standard_normal((n1, 32)).astype(np.float32)
    xy0 = rng.uniform(0, 640, (n0, 2)).astype(np.float32)
    xy1 = rng.uniform(0, 480, (n1, 2)).astype(np.float32)
    xyn0 = np.asarray(normalize_keypoints(jnp.asarray(xy0), 480, 640))
    xyn1 = np.asarray(normalize_keypoints(jnp.asarray(xy1), 480, 640))

    with torch.no_grad():
        la_t, sim_t, z0_t, z1_t = tnet(
            torch.from_numpy(desc0), torch.from_numpy(desc1),
            torch.from_numpy(xyn0), torch.from_numpy(xyn1))

    la_f, sim_f, z0_f, z1_f = fnet.apply(
        params, jnp.asarray(desc0), jnp.asarray(desc1),
        jnp.asarray(xyn0), jnp.asarray(xyn1),
        jnp.ones(n0, bool), jnp.ones(n1, bool))

    np.testing.assert_allclose(np.asarray(sim_f), sim_t.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(z0_f), z0_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(z1_f), z1_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(la_f), la_t.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_parity_with_padding_mask(torch_and_flax):
    """Padded flax rows must not change the valid rows' assignment."""
    tnet, fnet, params = torch_and_flax
    rng = np.random.default_rng(2)
    n0, n1, cap = 10, 13, 16
    desc0 = rng.standard_normal((cap, 32)).astype(np.float32)
    desc1 = rng.standard_normal((cap, 32)).astype(np.float32)
    xy0 = rng.uniform(0, 640, (cap, 2)).astype(np.float32)
    xy1 = rng.uniform(0, 480, (cap, 2)).astype(np.float32)
    m0 = np.arange(cap) < n0
    m1 = np.arange(cap) < n1
    xyn0 = np.asarray(normalize_keypoints(jnp.asarray(xy0), 480, 640))
    xyn1 = np.asarray(normalize_keypoints(jnp.asarray(xy1), 480, 640))

    with torch.no_grad():
        la_t, _, _, _ = tnet(
            torch.from_numpy(desc0[:n0]), torch.from_numpy(desc1[:n1]),
            torch.from_numpy(xyn0[:n0]), torch.from_numpy(xyn1[:n1]))

    la_f, _, _, _ = fnet.apply(
        params, jnp.asarray(desc0), jnp.asarray(desc1),
        jnp.asarray(xyn0), jnp.asarray(xyn1),
        jnp.asarray(m0), jnp.asarray(m1))

    np.testing.assert_allclose(np.asarray(la_f)[:n0, :n1], la_t.numpy(),
                               atol=5e-4, rtol=1e-3)
