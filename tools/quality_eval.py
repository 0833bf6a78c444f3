"""End-to-end downstream-quality artifact (QUALITY_r03.json).

The reference's entire evaluation gate is segmentation quality after the
generative pipeline (reference test_ss.py:46-51, segm_model.py:299-341):
train DSGAN -> sample (label, image) pairs -> train a segmentation net on
the GENERATED pairs -> evaluate RandScore / meanIU / CE on the held-out
REAL set.  This tool runs that loop twice at identical reduced scale:

  * ours: the real CLI drivers (train.py, test.py --save_as_single_image,
    train_ss.py, test_ss.py) on a 128px synthetic VNC-style dataset;
  * torch: the same geometry re-expressed with the reference-semantics
    oracle modules from tests/ (reference models/twostage_cycle_model.py
    :193-438 algebra), trained for the same number of steps, its samples
    fed to the same segmentation protocol, evaluated with the SAME metric
    code (supervised_gan_tpu.utils.metrics).

Run:  python tools/quality_eval.py [--epochs_gan 30] [--epochs_ss 20]
      [--samples 32] [--platform cpu|tpu] [--skip_torch]
Writes QUALITY_r03.json at the repo root; intermediate state under
/tmp/quality_r03/.

Round 4 (verdict item 2: a quality number at recipe scale on the real
chip): the geometry is parameterized — ``--px`` (128/256/512), ``--ngf``
(width multiplier for every net), ``--train_n/--test_n`` dataset sizes,
``--out`` artifact path.  The torch mirror stays 128px-only (it exists
to prove parity, done in r03); at other scales use --skip_torch and
read the result against the same-scale real-pairs upper bound:

  python tools/quality_eval.py --px 256 --ngf 16 --train_n 32 \
      --samples 64 --epochs_gan 50 --epochs_ss 20 --platform tpu \
      --skip_torch --out QUALITY_r04.json
"""

import argparse
import glob
import json
import os
import random
import re
import shutil
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, 'tests'))

WORK = '/tmp/quality_r03'
REAL = os.path.join(WORK, 'real')
GEN = os.path.join(WORK, 'gen')
CKPT = os.path.join(WORK, 'ckpt')
RESULTS = os.path.join(WORK, 'results')

def build_args(px=128, ngf=8, lr=2e-4):
    """DSGAN + segmentation CLI arg lists for a square ``px`` geometry
    (reduced README recipe: fcgan G1 -> px/2 label -> bilinear x2 -> CRN
    G2; unet F2; 1-scale D1/D2).  fcgan upsamples noiseSize*2^(n+1), so
    n_layers_G1 = log2(px)-4 puts the G1 label at px/2 with noiseSize 4
    (px=128 -> n3, matching r03; px=512 -> n5, matching bench.py).  CRN
    consumes a pool64 label, noiseSize2 = px//64.  D depth scales with
    resolution (2 layers at 128px, 3 above)."""
    import math
    n_g1 = int(math.log2(px)) - 4
    n_d = 2 if px <= 128 else 3
    gan_net = [
        '--model', 'twostage_cycle', '--which_direction', 'AtoB',
        '--dataset_mode', 'single', '--loadSize', str(px),
        '--fineSize', str(px),
        '--transform_1to2', 'bilinear_2', '--which_channel', 'rg_b',
        '--which_model_netG1', 'fcgan', '--n_layers_G1', str(n_g1),
        '--ngf1', str(ngf), '--noiseSize1', '4', '--noise_nc1', '8',
        '--which_model_netG2', 'crn', '--ngf2', str(ngf),
        '--upsample_mode2', 'bilinear', '--n_layers_CRN_block2', '2',
        '--which_model_netF2', 'unet_128', '--nff2', str(ngf),
        '--noiseSize2', str(px // 64), '--noise_nc2', '8',
        '--norm', 'instance', '--no_dropout1', '--manualSeed', '0',
    ]
    gan_train = gan_net + [
        '--batchSize', '1',
        '--which_model_netD1', 'n_layers', '--n_layers_D1', str(n_d),
        '--ndf1', str(ngf), '--scale_factor1', '1', '--lambda_D1', '0.5',
        '--which_model_netD2', 'n_layers', '--n_layers_D2', str(n_d),
        '--ndf2', str(ngf), '--scale_factor2', '1', '--lambda_D2', '0.5',
        '--lambda_A', '10', '--lambda_B', '10', '--lambda_A_cycle', '5',
        '--lambda_fake_cycle', '1', '--no_lsgan1', '--no_lsgan2',
        '--GAN_losses_D2', 'real_fake', '--GAN_losses_G2', 'real_fake',
        '--n_update_G', '1', '--pool_size', '16', '--lr1', repr(lr),
        '--lr2', repr(lr), '--print_freq', '64', '--display_id', '0',
        '--abort_on_nan', '--cache_data',
    ]
    ss_net = [
        '--model', 'segmentation', '--which_direction', 'AtoB',
        '--dataset_mode', 'single', '--loadSize', str(px),
        '--fineSize', str(px),
        '--batchSize', '1', '--which_channel', 'b_rg',
        '--which_model_netG', 'unet_128', '--ngf', str(ngf),
        '--noise_nc', '4', '--noiseSize', '4', '--norm', 'instance',
        '--which_metric', 'RandScore', 'meanIU',
        '--which_model_netD', 'None', '--manualSeed', '0',
        '--display_id', '0',
    ]
    ss_train = ss_net + ['--lambda_A', '1', '--print_freq', '64',
                         '--cache_data']
    return gan_net, gan_train, ss_net, ss_train


# 128px defaults, kept for the r03 reproduction and the torch mirror
GAN_NET_ARGS, GAN_TRAIN_ARGS, SS_NET_ARGS, SS_TRAIN_ARGS = build_args()


def make_dataset(root, seed=0, px=128, counts=(8, 4, 8)):
    """VNC-style synthetic at ``px``: R,G sparse binary label blobs, B
    image correlated with the labels (so segmentation has signal to
    learn).  Blob count/radius scale with area so density matches the
    128px original."""
    rng = np.random.RandomState(seed)
    from PIL import Image
    s = px // 128
    for phase, n in zip(('train', 'val', 'test'), counts):
        d = os.path.join(root, phase)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            r = np.zeros((px, px), np.float32)
            for _ in range(6 * s * s):             # blobby foreground
                cy, cx = rng.randint(10 * s, px - 10 * s, 2)
                yy, xx = np.ogrid[:px, :px]
                r += ((yy - cy) ** 2 + (xx - cx) ** 2
                      < rng.randint(5 * s, 14 * s) ** 2).astype(np.float32)
            r = (r > 0).astype(np.float32)
            g = 1.0 - r
            img = (0.7 * r + 0.15 * rng.rand(px, px)
                   + 0.1 * np.roll(r, 3 * s, 0))
            arr = np.stack([r, g, np.clip(img, 0, 1)], -1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                os.path.join(d, '%03d.png' % i))


def _hard_sample(rng, px):
    """One (px,px,3) hard VNC-style sample in [0,1].  R = foreground
    (thin cell membranes + mitochondria), G = background, B = EM-like
    image with per-cell albedo, band-limited texture, sensor noise,
    deliberately faint mitochondria and unlabeled dark distractor
    specks — built so the real-pairs segmentation bound lands well
    below 1.0 (round-5 gate-sensitivity requirement)."""
    import scipy.ndimage as ndi
    s = px / 256.0
    yy, xx = np.mgrid[0:px, 0:px].astype(np.float32)

    # Voronoi cells: nearest/second-nearest center distances
    ncell = max(8, int(round(px * px / (48.0 * 48.0 * s * s))))
    cy = rng.uniform(0, px, ncell).astype(np.float32)
    cx = rng.uniform(0, px, ncell).astype(np.float32)
    best = np.full((px, px), np.inf, np.float32)
    second = np.full((px, px), np.inf, np.float32)
    idx = np.zeros((px, px), np.int32)
    for k in range(ncell):
        dd = (yy - cy[k]) ** 2 + (xx - cx[k]) ** 2
        closer = dd < best
        second = np.where(closer, best, np.minimum(second, dd))
        idx = np.where(closer, k, idx)
        best = np.where(closer, dd, best)

    # thin membranes at cell boundaries (1-3 px at 256, scale-invariant)
    width = (0.6 + 0.6 * rng.rand()) * s
    memb = (np.sqrt(second) - np.sqrt(best)) < 2.0 * width

    # mitochondria: filled ellipses; ~25% deliberately faint
    mito = np.zeros((px, px), bool)
    depth = np.zeros((px, px), np.float32)
    # counts are scale-invariant: feature SIZES already scale with s, so
    # a fixed count keeps area fractions constant across px
    for _ in range(rng.randint(8, 17)):
        my = rng.uniform(8 * s, px - 8 * s)
        mx = rng.uniform(8 * s, px - 8 * s)
        a, b = rng.uniform(3 * s, 9 * s, 2)
        th = rng.uniform(0, np.pi)
        Y, X = yy - my, xx - mx
        u = (np.cos(th) * X + np.sin(th) * Y) / a
        v = (-np.sin(th) * X + np.cos(th) * Y) / b
        m = u * u + v * v < 1
        mito |= m
        d = (0.15 + 0.40 * rng.rand()) if rng.rand() < 0.25 \
            else (0.55 + 0.25 * rng.rand())
        depth = np.maximum(depth, m * np.float32(d))

    fg = memb | mito

    # EM-like image
    albedo = (0.55 + 0.25 * rng.rand(ncell)).astype(np.float32)
    img = albedo[idx]
    t = max(4, int(16 * s))
    low = rng.rand(px // t + 2, px // t + 2).astype(np.float32)
    img = img + 0.12 * (np.kron(low, np.ones((t, t),
                                             np.float32))[:px, :px] - 0.5)
    img = img * (1.0 - 0.55 * memb)
    img = img * (1.0 - depth)
    # unlabeled dark specks — distractors that resemble small mito
    for _ in range(24):
        sy = rng.randint(2, px - 2)
        sx = rng.randint(2, px - 2)
        r0 = max(1, int(round(rng.uniform(1, 2) * s)))
        img[max(0, sy - r0):sy + r0, max(0, sx - r0):sx + r0] *= 0.55
    img = ndi.gaussian_filter(img, 0.5 * s)
    img = img + 0.10 * rng.randn(px, px).astype(np.float32)

    r = fg.astype(np.float32)
    return np.stack([r, 1.0 - r, np.clip(img, 0, 1)], -1)


def make_dataset_hard(root, seed=0, px=256, counts=(20, 4, 8)):
    """Hard VNC-style synthetic dataset (see _hard_sample).  Same channel
    packing as make_dataset: R,G binary 2-class labels, B image."""
    rng = np.random.RandomState(seed)
    from PIL import Image
    for phase, n in zip(('train', 'val', 'test'), counts):
        d = os.path.join(root, phase)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            arr = _hard_sample(rng, px)
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                os.path.join(d, '%03d.png' % i))


def make_label_shuffled(src_train, dst_train, seed=0):
    """Negative control: derange the image (B) channel across the
    generated pairs so every label is paired with a WRONG image.  A
    sensitive downstream gate must score this far below the GAN row."""
    from PIL import Image
    paths = sorted(glob.glob(os.path.join(src_train, '*.png')))
    assert len(paths) >= 2, 'need >=2 generated pairs to shuffle'
    arrs = [np.asarray(Image.open(p).convert('RGB')) for p in paths]
    n = len(arrs)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    while np.any(perm == np.arange(n)):
        perm = rng.permutation(n)
    os.makedirs(dst_train, exist_ok=True)
    for i, p in enumerate(paths):
        a = arrs[i].copy()
        a[..., 2] = arrs[perm[i]][..., 2]
        Image.fromarray(a).save(os.path.join(dst_train, os.path.basename(p)))


def run(args, tag, platform):
    env = dict(os.environ)
    if platform != 'tpu':
        env['SGAN_TPU_PLATFORM'] = platform
    log = os.path.join(WORK, tag + '.log')
    t0 = time.time()
    with open(log, 'w') as f:
        rc = subprocess.call([sys.executable] + args, cwd=ROOT, env=env,
                             stdout=f, stderr=subprocess.STDOUT)
    out = open(log).read()
    print('[%s] rc=%d  %.0fs  (%s)' % (tag, rc, time.time() - t0, log),
          flush=True)
    if rc != 0:
        print(out[-3000:])
        raise RuntimeError('%s failed' % tag)
    return out


def parse_ss_metrics(out):
    m = {}
    for k in ('RandScore', 'meanIU'):
        hit = re.search(r'%s: ([0-9.eE+-]+)' % k, out)
        if hit:
            m[k] = float(hit.group(1))
    hit = re.search(r'cross entropy loss: mean ([0-9.eE+-]+), '
                    r'std ([0-9.eE+-]+)', out)
    if hit:
        m['CE_mean'] = float(hit.group(1))
        m['CE_std'] = float(hit.group(2))
    return m


def jax_pipeline(epochs_gan, epochs_ss, samples, platform,
                 GAN_NET_ARGS=GAN_NET_ARGS, GAN_TRAIN_ARGS=GAN_TRAIN_ARGS,
                 SS_NET_ARGS=SS_NET_ARGS, SS_TRAIN_ARGS=SS_TRAIN_ARGS,
                 negative_control=False):
    name = 'q3_gan'
    out = run(['train.py', '--dataroot', REAL, '--name', name,
               '--checkpoints_dir', CKPT, '--niter', str(epochs_gan),
               '--niter_decay', str(epochs_gan),
               '--save_epoch_freq', str(2 * epochs_gan)] + GAN_TRAIN_ARGS,
              'jax_gan_train', platform)
    # fail fast on adversarial divergence: sampling a NaN'd generator
    # silently yields all-black pairs and a meaningless downstream number
    tail_losses = [l for l in out.splitlines() if 'G2_GAN' in l][-3:]
    if any('nan' in l or 'inf' in l for l in tail_losses):
        raise RuntimeError('GAN training diverged — lower --lr '
                           '(tail: %s)' % (tail_losses[-1] if tail_losses
                                           else '?'))
    run(['test.py', '--dataroot', REAL, '--name', name,
         '--checkpoints_dir', CKPT, '--results_dir', RESULTS,
         '--how_many', str(samples), '--save_as_single_image']
        + GAN_NET_ARGS, 'jax_gan_sample', platform)

    # generated pairs -> train split; real val images -> val split
    os.makedirs(os.path.join(GEN, 'train'), exist_ok=True)
    imgs = sorted(glob.glob(os.path.join(
        RESULTS, name, 'test_latest', 'images', '*AB*.png')))
    assert imgs, 'no generated AB images found'
    for p in imgs:
        shutil.copy(p, os.path.join(GEN, 'train', os.path.basename(p)))
    if not os.path.isdir(os.path.join(GEN, 'val')):
        shutil.copytree(os.path.join(REAL, 'val'), os.path.join(GEN, 'val'))

    ss = 'q3_ss'
    run(['train_ss.py', '--dataroot', GEN, '--name', ss,
         '--checkpoints_dir', CKPT, '--niter', str(epochs_ss),
         '--niter_decay', str(epochs_ss),
         '--save_epoch_freq', str(2 * epochs_ss)] + SS_TRAIN_ARGS,
        'jax_ss_train', platform)
    out = run(['test_ss.py', '--dataroot', REAL, '--name', ss,
               '--checkpoints_dir', CKPT, '--results_dir', RESULTS,
               '--how_many', '999', '--which_epoch', 'latest',
               '--phase', 'test'] + SS_NET_ARGS,
              'jax_ss_test', platform)

    # upper bound: the same segmentation protocol trained on the REAL
    # train split (what a perfect generator would enable)
    ub = 'q3_ss_ub'
    run(['train_ss.py', '--dataroot', REAL, '--name', ub,
         '--checkpoints_dir', CKPT, '--niter', str(epochs_ss),
         '--niter_decay', str(epochs_ss),
         '--save_epoch_freq', str(2 * epochs_ss)] + SS_TRAIN_ARGS,
        'jax_ss_ub_train', platform)
    out_ub = run(['test_ss.py', '--dataroot', REAL, '--name', ub,
                  '--checkpoints_dir', CKPT, '--results_dir', RESULTS,
                  '--how_many', '999', '--which_epoch', 'latest',
                  '--phase', 'test'] + SS_NET_ARGS,
                 'jax_ss_ub_test', platform)

    # negative control: same protocol on label-shuffled generated pairs —
    # a sensitive gate must rank real-bound >= GAN >> shuffled
    neg = None
    if negative_control:
        gen_neg = GEN + '_neg'
        make_label_shuffled(os.path.join(GEN, 'train'),
                            os.path.join(gen_neg, 'train'))
        shutil.copytree(os.path.join(REAL, 'val'),
                        os.path.join(gen_neg, 'val'), dirs_exist_ok=True)
        sn = 'q5_ss_neg'
        run(['train_ss.py', '--dataroot', gen_neg, '--name', sn,
             '--checkpoints_dir', CKPT, '--niter', str(epochs_ss),
             '--niter_decay', str(epochs_ss),
             '--save_epoch_freq', str(2 * epochs_ss)] + SS_TRAIN_ARGS,
            'jax_ss_neg_train', platform)
        out_neg = run(['test_ss.py', '--dataroot', REAL, '--name', sn,
                       '--checkpoints_dir', CKPT, '--results_dir', RESULTS,
                       '--how_many', '999', '--which_epoch', 'latest',
                       '--phase', 'test'] + SS_NET_ARGS,
                      'jax_ss_neg_test', platform)
        neg = parse_ss_metrics(out_neg)
    return parse_ss_metrics(out), parse_ss_metrics(out_ub), len(imgs), neg


# ------------------------------------------------------------------ torch --
def load_real(phase):
    from PIL import Image
    out = []
    for p in sorted(glob.glob(os.path.join(REAL, phase, '*.png'))):
        a = np.asarray(Image.open(p), np.float32) / 255.0 * 2 - 1
        out.append(a)
    return np.stack(out)          # (N,128,128,3) in [-1,1]


def torch_pipeline(epochs_gan, epochs_ss, samples):
    """Reference-semantics torch mirror at the same geometry/step count."""
    import torch
    import torch.nn.functional as F
    from test_parity_dsgan import TorchCRN, TorchUnet
    from test_pth import torch_fcgan
    from baseline_torch import ScaledD, Pool, bce
    from supervised_gan_tpu.utils.metrics import compute_rand_f_scores

    torch.manual_seed(0)
    random.seed(0)
    np.random.seed(0)

    G1 = torch_fcgan(8, 2, 8, 3, True)
    G2 = TorchCRN(2, 1, 8, 8, 2)
    F2 = TorchUnet(1, 2, 7, 8)
    D1 = torch.nn.ModuleList([ScaledD(2, 8, 2, 1)])
    D2 = torch.nn.ModuleList([ScaledD(3, 8, 2, 1)])
    g_params = (list(G1.parameters()) + list(G2.parameters())
                + list(F2.parameters()))
    optG = torch.optim.Adam(g_params, lr=2e-4, betas=(0.5, 0.999))
    optD1 = torch.optim.Adam(D1.parameters(), lr=2e-4, betas=(0.5, 0.999))
    optD2 = torch.optim.Adam(D2.parameters(), lr=2e-4, betas=(0.5, 0.999))
    pool1, pool2 = Pool(16), Pool(16)
    lam_A, lam_B, lam_cyc, lam_fcyc = 10.0, 10.0, 5.0, 1.0

    def transform(x):
        return F.interpolate(x, scale_factor=2, mode='bilinear',
                             align_corners=True)

    train_imgs = load_real('train')
    total = 2 * epochs_gan * len(train_imgs)
    done = 0
    for epoch in range(2 * epochs_gan):
        # linear decay over the second half (reference base_model lr rule)
        if epoch >= epochs_gan:
            lr = 2e-4 * (1 - (epoch - epochs_gan) / float(epochs_gan))
            for o in (optG, optD1, optD2):
                for grp in o.param_groups:
                    grp['lr'] = lr
        for i in np.random.permutation(len(train_imgs)):
            a = train_imgs[i]
            if random.random() < 0.5:
                a = a[:, ::-1]
            t = torch.from_numpy(np.ascontiguousarray(
                np.transpose(a, (2, 0, 1))))[None]
            real_A, real_B = t[:, :2], t[:, 2:]
            z1 = torch.randn(1, 8, 4, 4)
            z2 = torch.randn(1, 8, 2, 2)
            fake_A = torch.tanh(G1.model(z1))              # 64px label
            fake_A_up = transform(fake_A)                  # 128px
            fake_B_real = G2(real_A, z2)
            fake_B_fake = G2(fake_A_up, z2)
            fake_A_from_B = F2(real_B)
            recon_real_A = F2(fake_B_real)
            recon_fake_A = F2(fake_B_fake)

            optD1.zero_grad()
            d1_real_in = F.avg_pool2d(real_A, 2)
            d1_fake = pool1.query(fake_A.detach())
            loss_D1 = 0.5 * sum(bce(d(d1_fake), False)
                                + bce(d(d1_real_in), True) for d in D1)
            loss_D1.backward()
            optD1.step()

            optD2.zero_grad()
            pair_real = torch.cat([real_A, real_B], 1)
            pair_fake = pool2.query(
                torch.cat([real_A, fake_B_real], 1).detach())
            loss_D2 = 0.5 * sum(bce(d(pair_fake), False)
                                + bce(d(pair_real), True) for d in D2)
            loss_D2.backward()
            optD2.step()

            optG.zero_grad()
            g1 = sum(0.5 * bce(d(fake_A), True) for d in D1)
            pair = torch.cat([real_A, fake_B_real], 1)
            g2 = sum(0.5 * bce(d(pair), True) for d in D2)
            l1 = lam_A * torch.mean(torch.abs(fake_B_real - real_B))
            ce = lam_B * F.binary_cross_entropy(
                torch.clamp((fake_A_from_B + 1) / 2, 0, 1),
                torch.clamp((real_A + 1) / 2, 0, 1))
            cyc_r = lam_cyc * F.binary_cross_entropy(
                torch.clamp((recon_real_A + 1) / 2, 0, 1),
                torch.clamp((real_A + 1) / 2, 0, 1))
            cyc_f = lam_cyc * lam_fcyc * F.binary_cross_entropy(
                torch.clamp((recon_fake_A + 1) / 2, 0, 1),
                torch.clamp((fake_A_up.detach() + 1) / 2, 0, 1))
            (g1 + g2 + l1 + ce + cyc_r + cyc_f).backward()
            optG.step()
            done += 1
        if (epoch + 1) % 10 == 0:
            print('[torch_gan] epoch %d/%d' % (epoch + 1, 2 * epochs_gan),
                  flush=True)

    # sample generated pairs
    gen = []
    with torch.no_grad():
        for _ in range(samples):
            z1 = torch.randn(1, 8, 4, 4)
            z2 = torch.randn(1, 8, 2, 2)
            lab = transform(torch.tanh(G1.model(z1)))
            img = G2(lab, z2)
            ab = torch.cat([lab, img], 1)[0].numpy()       # (3,128,128)
            gen.append(np.transpose(ab, (1, 2, 0)))

    # segmentation on generated pairs (image -> 2-class labels, CE)
    torch.manual_seed(0)
    S = TorchUnet(1, 2, 7, 8)
    optS = torch.optim.Adam(S.parameters(), lr=2e-4, betas=(0.5, 0.999))
    for epoch in range(2 * epochs_ss):
        if epoch >= epochs_ss:
            lr = 2e-4 * (1 - (epoch - epochs_ss) / float(epochs_ss))
            for grp in optS.param_groups:
                grp['lr'] = lr
        for i in np.random.permutation(len(gen)):
            a = gen[i]
            if random.random() < 0.5:
                a = a[:, ::-1]
            t = torch.from_numpy(np.ascontiguousarray(
                np.transpose(a, (2, 0, 1))))[None]
            img, labch = t[:, 2:], t[:, :2]
            label = ((labch + 1) / 2).argmax(1)            # (1,H,W)
            logits = S.model(img)
            loss = F.cross_entropy(logits, label)
            optS.zero_grad()
            loss.backward()
            optS.step()

    # evaluate on the REAL test set with the same metric code
    test_imgs = load_real('test')
    conf = np.zeros((2, 2), np.int64)
    rand_scores, ces = [], []
    with torch.no_grad():
        for a in test_imgs:
            t = torch.from_numpy(np.ascontiguousarray(
                np.transpose(a, (2, 0, 1))))[None]
            img, labch = t[:, 2:], t[:, :2]
            label = ((labch + 1) / 2).argmax(1)
            logits = S.model(img)
            prob = torch.softmax(logits, 1)
            ces.append(float(F.cross_entropy(logits, label)))
            Tm = ((labch + 1) / 2).numpy()[:, :1]
            Sm = prob.numpy()[:, :1]
            rand_scores.append(
                float(compute_rand_f_scores(Sm, Tm, do_thin=False).mean()))
            pred = prob.argmax(1).numpy().ravel()
            lab = label.numpy().ravel()
            conf += np.bincount(lab * 2 + pred, minlength=4).reshape(2, 2)
    rel, sel, tp = conf.sum(1), conf.sum(0), np.diag(conf)
    return {
        'RandScore': float(np.mean(rand_scores)),
        'meanIU': float(np.mean(tp / np.maximum(1, rel + sel - tp))),
        'CE_mean': float(np.mean(ces)),
        'CE_std': float(np.std(ces)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs_gan', type=int, default=30)
    ap.add_argument('--epochs_ss', type=int, default=20)
    ap.add_argument('--samples', type=int, default=32)
    ap.add_argument('--platform', default='cpu')
    ap.add_argument('--skip_torch', action='store_true')
    ap.add_argument('--px', type=int, default=128)
    ap.add_argument('--ngf', type=int, default=8)
    ap.add_argument('--train_n', type=int, default=8)
    ap.add_argument('--val_n', type=int, default=4)
    ap.add_argument('--test_n', type=int, default=8)
    ap.add_argument('--lr', type=float, default=2e-4,
                    help='GAN lr; 2e-4 matches the reference recipe but '
                         'can diverge on small synthetic sets at >=256px')
    ap.add_argument('--out', default='QUALITY_r03.json')
    ap.add_argument('--dataset', choices=('easy', 'hard'), default='easy',
                    help='hard: thin membranes + faint mito + noise so the '
                         'real-pairs bound lands well below 1.0')
    ap.add_argument('--negative_control', action='store_true',
                    help='add a label-shuffled-pairs row (gate sensitivity)')
    args = ap.parse_args()
    if args.px != 128 and not args.skip_torch:
        ap.error('the torch mirror is 128px-only; pass --skip_torch')

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    maker = make_dataset_hard if args.dataset == 'hard' else make_dataset
    maker(REAL, px=args.px, counts=(args.train_n, args.val_n, args.test_n))
    arg_lists = build_args(args.px, args.ngf, args.lr)

    t0 = time.time()
    ours, upper, n_gen, neg = jax_pipeline(
        args.epochs_gan, args.epochs_ss, args.samples, args.platform,
        *arg_lists, negative_control=args.negative_control)
    t_ours = time.time() - t0
    print('ours:', ours, flush=True)
    print('upper bound (real pairs):', upper, flush=True)
    if neg is not None:
        print('negative control (label-shuffled pairs):', neg, flush=True)

    theirs = None
    t_torch = None
    if not args.skip_torch:
        t0 = time.time()
        theirs = torch_pipeline(args.epochs_gan, args.epochs_ss,
                                args.samples)
        t_torch = time.time() - t0
        print('torch:', theirs, flush=True)

    out = {
        'pipeline': 'train DSGAN -> test.py sample -> train_ss on generated '
                    'pairs -> test_ss on real held-out set '
                    '(reference test_ss.py:46-51 gate)',
        'scale': {'px': args.px, 'ngf': args.ngf, 'lr': args.lr,
                  'epochs_gan': 2 * args.epochs_gan,
                  'epochs_ss': 2 * args.epochs_ss,
                  'train_images': args.train_n, 'generated_pairs': n_gen,
                  'test_images': args.test_n, 'dataset': args.dataset},
        'ours': ours,
        'torch_reference_semantics': theirs,
        'real_pairs_upper_bound': upper,
        'negative_control_label_shuffled': neg,
        'ours_platform': args.platform,
        'ours_wall_sec': round(t_ours, 1),
        'torch_wall_sec': round(t_torch, 1) if t_torch else None,
        'note': 'metrics computed by the same code '
                '(supervised_gan_tpu/utils/metrics.py) on both sides; '
                'higher RandScore/meanIU better, lower CE better',
    }
    with open(os.path.join(ROOT, args.out), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
