"""DISK torch->flax converter parity (VERDICT r2 #2).

Real checkpoints cannot be downloaded in this environment, so parity is
proven structurally, exactly as for SuperPoint / LightGlue: a torch
mirror of the published DISK thin U-Net (Tyszkiewicz et al. 2020,
cvg/DISK via the `unets` package — PReLU -> InstanceNorm -> 5x5 conv
thin blocks, avg-pool downsampling, nearest upsampling, [16,32,64,64,64]
down / [64,64,64,129] up, desc = [:128] / heat = [128]) is initialized
randomly, its state dict converted with models.disk.load_torch_weights
(order-based — naming-agnostic), and the flax forward must reproduce the
torch forward numerically. The converter fails LOUDLY on topology
mismatches (tensor count/shape), which is also asserted."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from tpu3drec.models.disk import (
    DISK, DISKNet, DOWN, UP, KSIZE, load_torch_weights,
)


class TorchThinBlock(nn.Module):
    def __init__(self, in_ch, out_ch, plain=False):
        super().__init__()
        self.plain = plain
        if not plain:
            self.gate = nn.PReLU(num_parameters=1)
            self.norm = nn.InstanceNorm2d(in_ch, affine=False)
        self.conv = nn.Conv2d(in_ch, out_ch, KSIZE, padding=KSIZE // 2)

    def forward(self, x):
        if not self.plain:
            x = self.norm(self.gate(x))
        return self.conv(x)


class TorchDISK(nn.Module):
    def __init__(self):
        super().__init__()
        downs = []
        in_ch = 3
        for i, ch in enumerate(DOWN):
            downs.append(TorchThinBlock(in_ch, ch, plain=(i == 0)))
            in_ch = ch
        self.path_down = nn.ModuleList(downs)
        ups = []
        bottom = DOWN[-1]
        for i, ch in enumerate(UP):
            skip = DOWN[len(DOWN) - 2 - i]
            ups.append(TorchThinBlock(bottom + skip, ch))
            bottom = ch
        self.path_up = nn.ModuleList(ups)

    def forward(self, x):
        skips = []
        h = x
        for i, blk in enumerate(self.path_down):
            if i > 0:
                h = F.avg_pool2d(h, 2)
            h = blk(h)
            skips.append(h)
        for i, blk in enumerate(self.path_up):
            skip = skips[len(DOWN) - 2 - i]
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = blk(torch.cat([h, skip], dim=1))
        return h   # (B, 129, H, W): desc [:128], heat [128]


@pytest.fixture(scope="module")
def torch_and_flax():
    torch.manual_seed(0)
    tnet = TorchDISK().eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = load_torch_weights(sd)
    return tnet, DISKNet(), params


def test_forward_parity(torch_and_flax):
    tnet, fnet, params = torch_and_flax
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (1, 3, 64, 80)).astype(np.float32)

    with torch.no_grad():
        out_t = tnet(torch.from_numpy(img)).numpy()   # (1, 129, H, W)

    heat_f, desc_f = fnet.apply(
        params, jnp.asarray(np.transpose(img, (0, 2, 3, 1))))

    np.testing.assert_allclose(np.asarray(heat_f)[0], out_t[0, 128],
                               atol=1e-4, rtol=1e-4)
    # flax normalizes descriptors; normalize torch's for comparison
    d_t = np.transpose(out_t[0, :128], (1, 2, 0))
    d_t = d_t / np.maximum(np.linalg.norm(d_t, axis=-1, keepdims=True),
                           1e-12)
    np.testing.assert_allclose(np.asarray(desc_f)[0], d_t,
                               atol=2e-4, rtol=1e-3)


def test_converter_is_naming_agnostic(torch_and_flax):
    """The official checkpoint uses `unet.path_down...` names; the
    order-based converter must produce identical params under any
    prefix."""
    tnet, fnet, params = torch_and_flax
    sd = {f"extractor.unet.{k}": v.detach().numpy()
          for k, v in tnet.state_dict().items()}
    params2 = load_torch_weights(sd)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(params2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_converter_rejects_wrong_topology(torch_and_flax):
    tnet, _, _ = torch_and_flax
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    # drop one tensor -> count/shape mismatch must fail loudly
    broken = dict(list(sd.items())[:-1])
    with pytest.raises((ValueError, StopIteration)):
        load_torch_weights(broken)
    # extra tensor
    extra = dict(sd)
    extra["zzz_extra"] = np.zeros(7, np.float32)
    with pytest.raises(ValueError):
        load_torch_weights(extra)


def test_extract_through_registry_gating(tmp_path, monkeypatch,
                                         torch_and_flax):
    """convert -> disk.npz -> detect_disk_features routes through the
    converted net end-to-end (random weights: routing is the assertion)."""
    import tpu3drec.models as models_pkg
    import tpu3drec.models.disk as disk_mod

    tnet, _, _ = torch_and_flax
    pth = tmp_path / "depth-save.pth"
    torch.save({"extractor": tnet.state_dict()}, pth)
    wd = tmp_path / "weights"
    monkeypatch.setattr(models_pkg, "WEIGHTS_DIR", wd)
    disk_mod.convert_torch_checkpoint(pth)
    assert (wd / "disk.npz").exists()

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (120, 160)).astype(np.float32)
    f = disk_mod.detect_disk_features(img, max_features=256)
    assert f.desc.shape == (256, 128)
    assert np.asarray(f.mask).dtype == bool
    got = np.asarray(f.xy)[np.asarray(f.mask)]
    assert (got >= 0).all() and (got[:, 0] < 160).all() \
        and (got[:, 1] < 120).all()


def test_wrapper_padded_extraction_contract():
    dk = DISK(max_features=128)
    dk.init_random((48, 60))
    img = jnp.asarray(np.random.default_rng(3)
                      .uniform(0, 1, (48, 60)).astype(np.float32))
    f = dk.extract(img)
    assert f.xy.shape == (128, 2) and f.desc.shape == (128, 128)
    m = np.asarray(f.mask)
    xy = np.asarray(f.xy)[m]
    assert (xy[:, 0] < 60).all() and (xy[:, 1] < 48).all()
