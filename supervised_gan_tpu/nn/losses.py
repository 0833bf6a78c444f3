"""Loss functions (pure, jit-safe).

  * gan_loss            — GANLoss (reference models/networks.py:152-185):
                          LSGAN -> MSE against a 0/1 target map,
                          vanilla -> BCE on already-sigmoided predictions.
  * gan_loss_multiclass — GANLossMultiClass (models/networks.py:188-202):
                          per-pixel CE over N-class logits.
  * weighted_l1_loss    — WeightedL1Loss (models/networks.py:205-214).
  * bce_loss            — torch.nn.BCELoss numerics (log clamped at -100).
  * cross_entropy_2d    — CrossEntropyLoss over (N,H,W,C) logits with
                          optional per-class weights (segmentation head).
"""

import jax
import jax.numpy as jnp


def _safe_log(x):
    # torch BCELoss clamps log terms at -100
    return jnp.maximum(jnp.log(jnp.maximum(x, 0.0)), -100.0)


@jax.custom_vjp
def _bce_elem(p, t):
    return -(t * _safe_log(p) + (1.0 - t) * _safe_log(1.0 - p))


def _bce_elem_fwd(p, t):
    return _bce_elem(p, t), (p, t)


def _bce_elem_bwd(res, g):
    # torch BCELoss backward: (p - t) / clamp_min(p*(1-p), eps).  The
    # naive autodiff of the clamped-forward form is NaN/inf at exactly
    # saturated predictions (f32 tanh/sigmoid DO reach p = 0/1, e.g. when
    # a discriminator wins hard) — this was the root cause of the GAN
    # NaN divergences at 256-512px (round 4): one saturated pixel poisons
    # the whole state in a single step.  torch bounds the grad at 1/eps;
    # mirror that.  Grad w.r.t. the target uses the same clamped logs.
    p, t = res
    denom = jnp.maximum(p * (1.0 - p), jnp.float32(1e-12))
    return (g * (p - t) / denom, g * (_safe_log(1.0 - p) - _safe_log(p)))


_bce_elem.defvjp(_bce_elem_fwd, _bce_elem_bwd)


def bce_loss(pred, target):
    """Mean binary cross entropy; pred in [0,1].  Forward matches
    torch.nn.BCELoss (log clamped at -100); backward matches torch's
    eps-clamped gradient, bounded even at saturated predictions."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return jnp.mean(_bce_elem(p, t))


def gan_loss(pred, target_is_real, use_lsgan=True):
    target = 1.0 if target_is_real else 0.0
    p = pred.astype(jnp.float32)
    if use_lsgan:
        return jnp.mean(jnp.square(p - target))
    return bce_loss(p, jnp.full_like(p, target))


def gan_loss_multiclass(logits, target_label, num_classes=3):
    """logits: (N,H,W,num_classes); target_label: int class id."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(logp[..., target_label])


def weighted_l1_loss(x, y, w=None):
    z = jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))
    if w is not None:
        z = z * w.astype(jnp.float32)
    return jnp.mean(z)


def cross_entropy_2d(logits, labels, weights=None):
    """logits: (N,H,W,C), labels: (N,H,W) int class ids.

    Matches torch CrossEntropyLoss / NLLLoss2d with optional per-class
    weights: the mean is normalized by the summed weights of the targets.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    if weights is None:
        return -jnp.mean(picked)
    w = jnp.asarray(weights, jnp.float32)[labels]
    return -jnp.sum(picked * w) / jnp.sum(w)
