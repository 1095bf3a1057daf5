"""ALIKED-n16 torch->flax converter parity.

Same structural-parity harness as SuperPoint / LightGlue / DISK: a torch
mirror of the published ALIKED-n16 blocks (ConvBlock / ResBlock with
deformable 3x3 convs implemented in pure torch with torchvision
deform_conv2d semantics — zero padding, per-tap (dy, dx) offsets,
bilinear — SMH score head, SDDH descriptor head) is initialized
randomly, its state dict converted with
models.aliked_n16.load_torch_weights, and the flax forward must
reproduce the torch forward numerically (dense maps AND sparse SDDH
descriptors). The documented topology assumptions (A1-A5 in
models/aliked_n16.py) are pinned by this mirror; a checkpoint violating
them fails loudly in the order-based converter."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from tpu3drec.models.aliked_n16 import (
    ALIKEDN16, CFG_N16, forward_dense, load_torch_weights,
    sddh_descriptors,
)

C = CFG_N16


def deform_conv3x3_torch(x, offsets, weight, bias):
    """Pure-torch deform_conv2d (A1): x (1, Cin, H, W), offsets
    (1, 18, H, W) as (dy, dx) per tap row-major, weight
    (Cout, Cin, 3, 3)."""
    _, cin, h, w = x.shape
    yy = torch.arange(h, dtype=torch.float32)[:, None].expand(h, w)
    xx = torch.arange(w, dtype=torch.float32)[None, :].expand(h, w)
    taps = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    acc = None
    for k, (dy, dx) in enumerate(taps):
        py = yy + dy + offsets[0, 2 * k]
        px = xx + dx + offsets[0, 2 * k + 1]
        # zero-padded bilinear
        x0 = torch.floor(px)
        y0 = torch.floor(py)
        fx = px - x0
        fy = py - y0
        v = torch.zeros(cin, h, w)
        for ddy, wy in ((0, 1 - fy), (1, fy)):
            for ddx, wx in ((0, 1 - fx), (1, fx)):
                xi = x0.long() + ddx
                yi = y0.long() + ddy
                ok = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
                xi_c = xi.clamp(0, w - 1)
                yi_c = yi.clamp(0, h - 1)
                val = x[0][:, yi_c, xi_c]            # (Cin, H, W)
                v = v + val * (wy * wx * ok.float())[None]
        contrib = torch.einsum("chw,oc->ohw", v, weight[:, :, 1 + dy,
                                                        1 + dx])
        acc = contrib if acc is None else acc + contrib
    return (acc + bias[:, None, None])[None]


class TorchDeformConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.offset_conv = nn.Conv2d(cin, 18, 3, padding=1)
        self.regular = nn.Conv2d(cin, cout, 3, padding=1)

    def forward(self, x):
        offs = self.offset_conv(x)
        return deform_conv3x3_torch(x, offs, self.regular.weight,
                                    self.regular.bias)


class TorchConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(cout)

    def forward(self, x):
        x = F.selu(self.bn1(self.conv1(x)))
        return F.selu(self.bn2(self.conv2(x)))


class TorchResBlock(nn.Module):
    def __init__(self, cin, cout, deform):
        super().__init__()
        conv = (lambda a, b: TorchDeformConv(a, b)) if deform \
            else (lambda a, b: nn.Conv2d(a, b, 3, padding=1))
        self.conv1 = conv(cin, cout)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = conv(cout, cout)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        y = F.selu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.selu(y + self.downsample(x))


class TorchSDDH(nn.Module):
    def __init__(self, dim, K, M):
        super().__init__()
        self.K, self.M = K, M
        self.off1 = nn.Conv2d(dim, 2 * M, K, padding=0)
        self.off2 = nn.Conv2d(2 * M, 2 * M, 1)
        self.sf = nn.Conv2d(dim, dim, 1, bias=False)
        self.agg = nn.Parameter(torch.rand(M, dim, dim))

    def forward(self, feat, xy):
        # feat (1, dim, H, W) L2-normalized; xy (N, 2) pixels
        _, dim, h, w = feat.shape
        r = self.K // 2
        xi = xy[:, 0].round().long().clamp(r, w - 1 - r)
        yi = xy[:, 1].round().long().clamp(r, h - 1 - r)
        descs = []
        for n in range(xy.shape[0]):
            patch = feat[:, :, yi[n] - r: yi[n] + r + 1,
                         xi[n] - r: xi[n] + r + 1]
            o = self.off2(F.selu(self.off1(patch)))[0, :, 0, 0]
            off = o.view(self.M, 2)                      # (x, y) A4
            px = xy[n, 0] + off[:, 0]
            py = xy[n, 1] + off[:, 1]
            # zero-padded bilinear samples of feat
            x0 = torch.floor(px)
            y0 = torch.floor(py)
            fx = (px - x0)
            fy = (py - y0)
            v = torch.zeros(self.M, dim)
            for ddy, wy in ((0, 1 - fy), (1, fy)):
                for ddx, wx in ((0, 1 - fx), (1, fx)):
                    xq = (x0.long() + ddx)
                    yq = (y0.long() + ddy)
                    ok = ((xq >= 0) & (xq < w) & (yq >= 0) & (yq < h))
                    val = feat[0, :, yq.clamp(0, h - 1),
                               xq.clamp(0, w - 1)].T   # (M, dim)
                    v = v + val * (wy * wx * ok.float())[:, None]
            v = self.sf(v.T[None, :, :, None])[0, :, :, 0].T  # (M, dim)
            d = torch.einsum("md,mde->e", v, self.agg)
            descs.append(d / d.norm().clamp_min(1e-12))
        return torch.stack(descs)


class TorchALIKED(nn.Module):
    def __init__(self):
        super().__init__()
        c1, c2, c3, c4 = C["c1"], C["c2"], C["c3"], C["c4"]
        dim = C["dim"]
        self.block1 = TorchConvBlock(3, c1)
        self.block2 = TorchResBlock(c1, c2, False)
        self.block3 = TorchResBlock(c2, c3, True)
        self.block4 = TorchResBlock(c3, c4, True)
        q = dim // 4
        self.conv1 = nn.Conv2d(c1, q, 1, bias=False)
        self.conv2 = nn.Conv2d(c2, q, 1, bias=False)
        self.conv3 = nn.Conv2d(c3, q, 1, bias=False)
        self.conv4 = nn.Conv2d(c4, q, 1, bias=False)
        self.score1 = nn.Conv2d(dim, 8, 1, bias=False)
        self.score2 = nn.Conv2d(8, 4, 3, padding=1, bias=False)
        self.score3 = nn.Conv2d(4, 4, 3, padding=1, bias=False)
        self.score4 = nn.Conv2d(4, 1, 3, padding=1)
        self.sddh = TorchSDDH(dim, C["K"], C["M"])

    def dense(self, x):
        h, w = x.shape[2:]
        x1 = self.block1(x)
        x2 = self.block2(F.avg_pool2d(x1, 2))
        x3 = self.block3(F.avg_pool2d(x2, 4))
        x4 = self.block4(F.avg_pool2d(x3, 4))
        up = lambda t: F.interpolate(t, size=(h, w), mode="bilinear",
                                     align_corners=True)
        a1 = F.selu(self.conv1(x1))
        a2 = up(F.selu(self.conv2(x2)))
        a3 = up(F.selu(self.conv3(x3)))
        a4 = up(F.selu(self.conv4(x4)))
        cat = torch.cat([a1, a2, a3, a4], dim=1)
        s = F.selu(self.score1(cat))
        s = F.selu(self.score2(s))
        s = F.selu(self.score3(s))
        score = torch.sigmoid(self.score4(s))[:, 0]
        feat = F.normalize(cat, p=2, dim=1)
        return score, feat


@pytest.fixture(scope="module")
def nets():
    torch.manual_seed(0)
    tnet = TorchALIKED().eval()
    # non-trivial BN running stats (fresh BNs have mean 0 / var 1)
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.5)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = load_torch_weights(sd)
    return tnet, params


def test_dense_forward_parity(nets):
    tnet, params = nets
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        score_t, feat_t = tnet.dense(
            torch.from_numpy(np.transpose(img, (2, 0, 1))[None]))
    score_f, feat_f = forward_dense(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(score_f), score_t[0].numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(feat_f), np.transpose(feat_t[0].numpy(), (1, 2, 0)),
        atol=2e-4, rtol=1e-3)


def test_sddh_parity(nets):
    tnet, params = nets
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    xy = np.stack([rng.uniform(5, 90, 12), rng.uniform(5, 58, 12)],
                  axis=1).astype(np.float32)
    with torch.no_grad():
        _, feat_t = tnet.dense(
            torch.from_numpy(np.transpose(img, (2, 0, 1))[None]))
        d_t = tnet.sddh(feat_t, torch.from_numpy(xy)).numpy()
    _, feat_f = forward_dense(params, jnp.asarray(img))
    d_f = np.asarray(sddh_descriptors(params["sddh"], feat_f,
                                      jnp.asarray(xy)))
    np.testing.assert_allclose(d_f, d_t, atol=5e-4, rtol=1e-3)


def test_converter_rejects_wrong_topology(nets):
    tnet, _ = nets
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    broken = dict(list(sd.items())[:-1])
    with pytest.raises(ValueError):
        load_torch_weights(broken)
    extra = dict(sd)
    extra["zzz"] = np.zeros(5, np.float32)
    with pytest.raises(ValueError):
        load_torch_weights(extra)


def test_registry_drop_in(tmp_path, monkeypatch, nets):
    import tpu3drec.models as models_pkg
    import tpu3drec.models.aliked_n16 as n16
    from tpu3drec.models.aliked import detect_aliked_features

    tnet, _ = nets
    pth = tmp_path / "aliked-n16.pth"
    torch.save(tnet.state_dict(), pth)
    wd = tmp_path / "weights"
    monkeypatch.setattr(models_pkg, "WEIGHTS_DIR", wd)
    n16.convert_torch_checkpoint(pth)
    assert (wd / "aliked.npz").exists()

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (96, 128)).astype(np.float32)
    f = detect_aliked_features(img, max_features=128)
    assert f.method == "ALIKED"
    assert f.desc.shape == (128, C["dim"])
    m = np.asarray(f.mask)
    xy = np.asarray(f.xy)[m]
    assert (xy[:, 0] >= -2).all() and (xy[:, 0] < 130).all()
    norms = np.linalg.norm(np.asarray(f.desc)[m], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
