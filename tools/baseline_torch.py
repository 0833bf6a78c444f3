"""Measured PyTorch anchor for BASELINE.md -> BASELINE_TORCH.json.

Re-expresses the reference's DSGAN twostage_cycle training iteration
(reference models/twostage_cycle_model.py:193-438) in plain PyTorch at the
bench architecture (512px, fcgan G1 ngf32 + CRN G2 ngf64 + unet_128 F2
nff32, 2-scale D1, 4-scale D2, six-term G loss, pools, three Adams,
n_update 1 each) and times a few steps on this host's CPU.

The reference publishes no numbers and no GPU exists here, so this is the
only *measured* PyTorch data point available; bench.py's vs_baseline keeps
its FLOP-derived A100 estimate, and BASELINE.md records this CPU anchor
alongside it.  Built from the same torch oracle modules the parity tests
use (tests/test_parity_dsgan.py) — no reference code.

Run: python tools/baseline_torch.py [n_steps]
"""

import json
import os
import random
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, 'tests'))

from test_parity_dsgan import TorchCRN, TorchUnet  # noqa: E402
from test_pth import torch_fcgan  # noqa: E402
from test_parity_extra import torch_patchgan  # noqa: E402


def fspecial_blur(channels, scale):
    from supervised_gan_tpu.ops import matlab_gauss2d
    sigma = scale // 2
    k = 4 * sigma + 1
    g = matlab_gauss2d((k, k), sigma)
    filt = np.zeros((channels, channels, k, k), np.float32)
    for i in range(channels):
        filt[i, i] = g
    return torch.from_numpy(filt), k // 2


class ScaledD(torch.nn.Module):
    """PatchGAN with the frozen fspecial blur + stride-subsample front end
    (reference networks.py:807-813, 841-843)."""

    def __init__(self, input_nc, ndf, n_layers, scale):
        super().__init__()
        self.inner = torch_patchgan(input_nc, ndf, n_layers, True)
        self.scale = scale
        if scale > 1:
            filt, pad = fspecial_blur(input_nc, scale)
            self.register_buffer('filt', filt)
            self.pad = pad

    def forward(self, x):
        if self.scale > 1:
            x = F.conv2d(x, self.filt, padding=self.pad)
            x = F.avg_pool2d(x, kernel_size=1, stride=self.scale)
        return self.inner.model(x)


class Pool:
    """ImagePool with reference accept/swap semantics
    (reference util/image_pool.py:13-33)."""

    def __init__(self, size):
        self.size, self.buf = size, []

    def query(self, img):
        if self.size == 0:
            return img
        if len(self.buf) < self.size:
            self.buf.append(img.detach().clone())
            return img
        if random.random() > 0.5:
            i = random.randrange(self.size)
            old = self.buf[i].clone()
            self.buf[i] = img.detach().clone()
            return old
        return img


def bce(pred, target_is_real):
    t = torch.ones_like(pred) if target_is_real else torch.zeros_like(pred)
    return F.binary_cross_entropy(pred, t)


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    torch.manual_seed(0)
    random.seed(0)
    torch.set_num_threads(os.cpu_count() or 1)

    G1 = torch_fcgan(8, 2, 32, 5, True)
    G2 = TorchCRN(2, 1, 8, 64, 2)
    F2 = TorchUnet(1, 2, 7, 32, use_dropout=True)
    D1 = torch.nn.ModuleList([ScaledD(2, 32, 3, s) for s in (1, 2)])
    D2 = torch.nn.ModuleList([ScaledD(3, 64, n, s)
                              for n, s in ((3, 1), (4, 1), (3, 2), (4, 2))])
    lambda_D1, lambda_D2 = (0.5, 0.4), (0.3, 0.3, 0.2, 0.2)
    lam_A, lam_B, lam_cyc, lam_fcyc = 10.0, 10.0, 5.0, 1.0

    g_params = (list(G1.parameters()) + list(G2.parameters())
                + list(F2.parameters()))
    optG = torch.optim.Adam(g_params, lr=2e-4, betas=(0.5, 0.999))
    optD1 = torch.optim.Adam(D1.parameters(), lr=2e-4, betas=(0.5, 0.999))
    optD2 = torch.optim.Adam(D2.parameters(), lr=2e-4, betas=(0.5, 0.999))
    pool1, pool2 = Pool(50), Pool(50)

    real = torch.rand(1, 3, 512, 512) * 2 - 1
    real_A, real_B = real[:, :2], real[:, 2:]

    def transform(x):
        return F.interpolate(x, scale_factor=2, mode='bilinear',
                             align_corners=True)

    def step():
        z1 = torch.randn(1, 8, 4, 4)
        z2 = torch.randn(1, 8, 8, 8)
        fake_A = torch.tanh(G1.model(z1))                      # 256px label
        fake_A_up = transform(fake_A)                          # 512px
        fake_B_real = G2(real_A, z2)
        fake_B_fake = G2(fake_A_up, z2)
        fake_A_from_B = F2(real_B)
        recon_real_A = F2(fake_B_real)
        recon_fake_A = F2(fake_B_fake)

        # D1 (label space; real side = avgpool2(real_A))
        optD1.zero_grad()
        d1_real_in = F.avg_pool2d(real_A, 2)
        d1_fake = pool1.query(fake_A.detach())
        loss_D1 = 0.5 * sum(bce(d(d1_fake), False) + bce(d(d1_real_in), True)
                            for d in D1)
        loss_D1.backward()
        optD1.step()

        # D2 (real_fake pair set)
        optD2.zero_grad()
        pair_real = torch.cat([real_A, real_B], 1)
        pair_fake = pool2.query(
            torch.cat([real_A, fake_B_real], 1).detach())
        loss_D2 = 0.5 * sum(bce(d(pair_fake), False) + bce(d(pair_real), True)
                            for d in D2)
        loss_D2.backward()
        optD2.step()

        # G (six terms, logD trick)
        optG.zero_grad()
        g1 = sum(lam * bce(d(fake_A), True) for d, lam in zip(D1, lambda_D1))
        pair = torch.cat([real_A, fake_B_real], 1)
        g2 = sum(lam * bce(d(pair), True) for d, lam in zip(D2, lambda_D2))
        l1 = lam_A * torch.mean(torch.abs(fake_B_real - real_B))
        ce = lam_B * F.binary_cross_entropy((fake_A_from_B + 1) / 2,
                                            (real_A + 1) / 2)
        cyc_r = lam_cyc * F.binary_cross_entropy((recon_real_A + 1) / 2,
                                                 (real_A + 1) / 2)
        cyc_f = lam_cyc * lam_fcyc * F.binary_cross_entropy(
            (recon_fake_A + 1) / 2, (fake_A_up.detach() + 1) / 2)
        (g1 + g2 + l1 + ce + cyc_r + cyc_f).backward()
        optG.step()

    step()                                   # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = (time.perf_counter() - t0) / n_steps
    out = {'metric': 'vnc512_dsgan_torch_cpu_images_per_sec',
           'sec_per_step': round(dt, 2),
           'images_per_sec': round(1.0 / dt, 4),
           'threads': torch.get_num_threads(),
           'note': 'reference-semantics DSGAN step in PyTorch on this '
                   'host CPU (no GPU available); measured anchor for '
                   'BASELINE.md'}
    with open(os.path.join(ROOT, 'BASELINE_TORCH.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
