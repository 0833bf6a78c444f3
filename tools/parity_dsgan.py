"""Full-size DSGAN generation-stack parity runner -> PARITY_r02.json.

Executes the reference test.py forward semantics (twostage_cycle test path,
reference models/twostage_cycle_model.py:229-239) at the REAL bench config
(512px: fcgan G1 ngf32/n5 -> bilinear x2 -> CRN G2 ngf64/noise 8px) twice:
once with our JAX nets, once with independent torch oracle modules loaded
from our exported .pth files, on identical noise — and records L1 / PSNR.

The published pretrained twostage_D1G1.pth artifacts are not available in
this environment (no egress); this runner is the declared-metric gate on
self-generated weights, exercising the full 512px stack + .pth boundary.

Run on CPU: JAX_PLATFORMS=cpu python tools/parity_dsgan.py
"""

import json
import os
import sys
import tempfile

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                + '/tests')

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from supervised_gan_tpu import nn  # noqa: E402
from supervised_gan_tpu.ops import bilinear_upsample  # noqa: E402
from supervised_gan_tpu.utils import pth as pthio  # noqa: E402


def main():
    from test_pth import torch_fcgan
    from test_parity_dsgan import TorchCRN, _load_oracle, _nchw, _nhwc

    # bench.py DSGAN_ARGS architecture (reference README.md:18)
    g1 = nn.define_G(2, 0, 32, 'fcgan', 'instance', False, n_layers_G=5,
                     use_fcn=True, noise_nc=8)
    g2 = nn.define_G(2, 1, 64, 'crn', 'instance', False, n_layers_G=5,
                     noise_nc=8, upsample_mode='bilinear',
                     n_layers_CRN_block=2)
    p1 = g1.init(jax.random.PRNGKey(0))
    p2 = g2.init(jax.random.PRNGKey(1))

    tmp = tempfile.mkdtemp()

    class P:
        def __truediv__(self, name):
            return os.path.join(tmp, name)

    o1 = _load_oracle(torch_fcgan(8, 2, 32, 5, True), g1, p1, P(), 'g1.pth')
    o2 = _load_oracle(TorchCRN(2, 1, 8, 64, 2), g2, p2, P(), 'g2.pth')

    rng = np.random.RandomState(0)
    z1 = rng.randn(1, 4, 4, 8).astype(np.float32)    # -> 256px label
    z2 = rng.randn(1, 8, 8, 8).astype(np.float32)    # CRN noise @512px

    fake_a = g1.apply(p1, jnp.asarray(z1), nn.Ctx())
    fake_b = g2.apply(p2, bilinear_upsample(fake_a, 2), jnp.asarray(z2),
                      nn.Ctx())

    with torch.no_grad():
        t_a = torch.tanh(o1.model(_nchw(z1)))
        t_a_up = torch.nn.functional.interpolate(
            t_a, scale_factor=2, mode='bilinear', align_corners=True)
        t_b = o2(t_a_up, _nchw(z2))

    out = {'config': 'bench DSGAN 512px (fcgan ngf32 n5 + CRN ngf64 nlb2)',
           'noise_seed': 0, 'weights': 'self-generated (published '
           'twostage_D1G1.pth unavailable: no egress)'}
    ok = True
    for ours, theirs, name in ((fake_a, t_a, 'fake_A_256'),
                               (fake_b, t_b, 'fake_B_512')):
        a, b = np.asarray(ours), _nhwc(theirs)
        l1 = float(np.mean(np.abs(a - b)))
        mse = float(np.mean((a - b) ** 2))
        psnr = float(10 * np.log10(4.0 / mse)) if mse > 0 else float('inf')
        out[name] = {'shape': list(a.shape), 'L1': l1,
                     'PSNR_dB': round(psnr, 2)}
        ok = ok and psnr > 40.0
    out['ok'] = ok
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'PARITY_r02.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
