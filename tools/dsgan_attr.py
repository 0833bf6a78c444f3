"""Attribute DSGAN step time: G forward / D1 grad / D2 grad / G grad / pools,
at the real 512px shapes, each phase in its own jit with scan loops."""
import os, sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from supervised_gan_tpu.options import TrainOptions
from supervised_gan_tpu.models import create_model
from bench import DSGAN_ARGS

opt = TrainOptions().parse(DSGAN_ARGS)
model = create_model(opt)
rng = np.random.RandomState(0)
batch = {'A': rng.uniform(-1,1,(1,512,512,3)).astype(np.float32), 'A_paths': ['x']}
model.set_input(batch)
inputs = {'A': model.input_A, 'B': model.input_B}
state = model.state
key = jax.random.PRNGKey(0)

step = model._build_train_step()
# monkey-instrument: rebuild the pieces via the model's internals
from supervised_gan_tpu import nn
from supervised_gan_tpu.models.common import g_apply, bank_apply
from supervised_gan_tpu.nn.losses import gan_loss, weighted_l1_loss, bce_loss

cd = model.compute_dtype
netG1, netG2, netF2 = model.netG1, model.netG2, model.netF2
netD1, netD2 = model.netD1, model.netD2
noise1 = jax.random.normal(key, (1,4,4,8))
noise2 = jax.random.normal(key, (1,8,8,8))
p = state['params']

def ctx(k=None): return nn.Ctx(k, compute_dtype=cd)

def timeit(name, fn, *args, n=10):
    y = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n): y = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)))
    print('%-28s %.2f ms' % (name, (time.perf_counter()-t0)/n*1000), flush=True)

# G1 fwd
g1 = jax.jit(lambda p1, n1: g_apply(netG1, p1, ctx(key), noise=n1))
timeit('G1 fwd (256px label)', g1, p['G1'], noise1)
fake_A = g1(p['G1'], noise1)
from supervised_gan_tpu.ops import bilinear_upsample
xin = bilinear_upsample(fake_A, 2)

# G2 (CRN) fwd single
g2 = jax.jit(lambda p2, x, n2: g_apply(netG2, p2, ctx(key), x=x, noise=n2))
timeit('G2 CRN fwd 512', g2, p['G2'], inputs['A'], noise2)
fake_B = g2(p['G2'], inputs['A'], noise2)

# F2 unet fwd single
f2 = jax.jit(lambda pf, x, n2: g_apply(netF2, pf, ctx(key), x=x, noise=n2))
timeit('F2 unet fwd 512', f2, p['F2'], inputs['B'], noise2)

# D2 bank fwd (4 Ds on 3ch pair)
pair = jnp.concatenate([inputs['A'], inputs['B']], -1)
d2f = jax.jit(lambda pd, x: bank_apply(netD2, pd, x, ctx))
timeit('D2 bank fwd (4 Ds)', d2f, p['D2'], pair)

# D2 grad (fake+real)
def d2_loss(pd, fake, real):
    lf = sum(gan_loss(o, False, False) for o in bank_apply(netD2, pd, fake, ctx))
    lr = sum(gan_loss(o, True, False) for o in bank_apply(netD2, pd, real, ctx))
    return 0.5*(lf+lr)
d2g = jax.jit(jax.grad(d2_loss))
timeit('D2 grad (fake+real)', d2g, p['D2'], pair, pair)

# G2-only grad through D2 + L1
def g2_loss(p2):
    fb = g_apply(netG2, p2, ctx(key), x=inputs['A'], noise=noise2)
    fake = jnp.concatenate([inputs['A'], fb], -1)
    loss = sum(gan_loss(o, True, False)*l for o,l in zip(bank_apply(netD2, p['D2'], fake, ctx), (0.3,0.3,0.2,0.2)))
    return loss + 10*weighted_l1_loss(fb, inputs['B'])
g2g = jax.jit(jax.grad(g2_loss))
timeit('G2 grad (CRN + D2 bank)', g2g, p['G2'])

# F2-only grad (BCE terms)
def f2_loss(pf):
    fa = g_apply(netF2, pf, ctx(key), x=inputs['B'], noise=noise2)
    return bce_loss((fa+1)/2, (inputs['A']+1)/2)
f2g = jax.jit(jax.grad(f2_loss))
timeit('F2 grad (unet, 1 pass)', f2g, p['F2'])
