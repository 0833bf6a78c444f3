"""Isolated op timings on the attached TPU (slope methodology).

The remote-execution relay charges a fixed ~30 ms per value fetch and
~0.85 ms per dispatch, so wall-clock of a single call is meaningless.
Every number here is the SLOPE between two lax.scan lengths,
(t(n2) - t(n1)) / (n2 - n1), which cancels all fixed costs
(BENCH_NOTES.md round 2, "Measurement method fix").

The scan body re-derives its input from the carry scalar (x0 + c) and
feeds one output element back into the carry, so XLA can neither hoist
the op out of the loop nor dead-code it.  The broadcast add costs one
elementwise pass over the input (<0.1 ms at the largest shapes here);
it is identical across A/B comparisons of the same signature.

Usage: python tools/microbench.py [case ...]   (default: all)
       python tools/microbench.py --list
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DT = jnp.bfloat16
_DIMS = ("NHWC", "HWIO", "NHWC")


def conv(x, w, s, p):
    return lax.conv_general_dilated(
        x, w, (s, s), ((p, p), (p, p)), dimension_numbers=_DIMS)


def convT(x, w, s=2, p=1):
    k = w.shape[0]
    return lax.conv_general_dilated(
        x, w, (1, 1), ((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
        lhs_dilation=(s, s), dimension_numbers=_DIMS)


def _key(i):
    return jax.random.PRNGKey(i)


def make_conv_case(xshape, wshape, s, p, mode="fwd"):
    """mode: fwd | vjp (joint dx+dw) | dx (lhs-dilated form) | dw."""
    x = jax.random.normal(_key(0), xshape, DT)
    w = jax.random.normal(_key(1), wshape, DT) * 0.05

    if mode == "fwd":
        f, args = (lambda a, b: conv(a, b, s, p)), (x, w)
    elif mode == "convt":
        f, args = (lambda a, b: convT(a, b, s, p)), (x, w)
    elif mode == "convtvjp":
        y = jax.eval_shape(lambda a: convT(a, w, s, p), x)
        g = jax.random.normal(_key(2), y.shape, DT)
        def f(gv, a, b):
            _, pull = jax.vjp(lambda xv, wv: convT(xv, wv, s, p), a, b)
            return pull(gv)
        args = (g, x, w)
    elif mode == "p3dw2":
        import sys as _s, os as _o
        _s.path.insert(0, _o.path.dirname(_o.path.dirname(
            _o.path.abspath(__file__))))
        from supervised_gan_tpu.ops.pallas import conv3x3 as _p3
        g = jax.random.normal(_key(2), xshape, DT)
        f, args = (lambda a, b: _p3._conv3x3_dw_v2(b, a)), (g, x)
    elif mode == "pconvt":
        import sys as _s, os as _o
        _s.path.insert(0, _o.path.dirname(_o.path.dirname(
            _o.path.abspath(__file__))))
        from supervised_gan_tpu.ops.pallas import convt4s2 as _m
        assert _m.supported(x, w), (xshape, wshape)
        f, args = (lambda a, b: _m._convt_fwd(a, b, None)), (x, w)
    elif mode in ("hconvt", "hconvtvjp"):
        import sys as _s, os as _o
        _s.path.insert(0, _o.path.dirname(_o.path.dirname(
            _o.path.abspath(__file__))))
        from supervised_gan_tpu.ops import edge_conv as _e
        if mode.endswith("vjp"):
            y = jax.eval_shape(lambda a: convT(a, w, s, p), x)
            g = jax.random.normal(_key(2), y.shape, DT)
            def f(gv, a, b):
                _, pull = jax.vjp(
                    lambda xv, wv: _e.head_convt(xv, wv, None, s, p), a, b)
                return pull(gv)
            args = (g, x, w)
        else:
            f, args = (lambda a, b: _e.head_convt(a, b, None, s, p)), (x, w)
    elif mode in ("stemph", "stemphvjp"):
        # stem_conv_phase: the conv's input arrives phase-major
        import sys as _s, os as _o
        _s.path.insert(0, _o.path.dirname(_o.path.dirname(
            _o.path.abspath(__file__))))
        from supervised_gan_tpu.ops import edge_conv as _e
        xph = _e.space_to_phase(x, s)
        if mode.endswith("vjp"):
            y = jax.eval_shape(lambda a: conv(a, w, s, p), x)
            g = jax.random.normal(_key(2), y.shape, DT)
            def f(gv, a, b):
                _, pull = jax.vjp(
                    lambda xv, wv: _e.stem_conv_phase(xv, wv, None, s, p),
                    a, b)
                return pull(gv)
            args = (g, xph, w)
        else:
            f, args = (lambda a, b: _e.stem_conv_phase(a, b, None, s, p)), \
                (xph, w)
    elif mode == "dwgcols":
        import sys as _s, os as _o
        _s.path.insert(0, _o.path.dirname(_o.path.dirname(
            _o.path.abspath(__file__))))
        from supervised_gan_tpu.ops import edge_conv as _e
        y = jax.eval_shape(lambda a: conv(a, w, s, p), x)
        g = jax.random.normal(_key(2), y.shape, DT)
        f, args = (lambda gv, a: _e.dw_gcols(a, gv)), (g, x)
    elif mode == "blurph":
        import sys as _s, os as _o
        _s.path.insert(0, _o.path.dirname(_o.path.dirname(
            _o.path.abspath(__file__))))
        from supervised_gan_tpu.ops import edge_conv as _e
        from supervised_gan_tpu.ops.resample import blur_downsample_phase
        xph = _e.space_to_phase(x, 2)
        f, args = (lambda a: blur_downsample_phase(a, 2, s)), (xph,)
    elif mode in ("head", "stem", "mid", "headvjp", "stemvjp", "midvjp"):
        import sys as _s, os as _o
        _s.path.insert(0, _o.path.dirname(_o.path.dirname(
            _o.path.abspath(__file__))))
        from supervised_gan_tpu.ops import edge_conv as _e
        op = {"head": _e.head_conv, "stem": _e.stem_conv,
              "mid": _e.mid_conv}[mode.replace("vjp", "")]
        if mode.endswith("vjp"):
            y = jax.eval_shape(lambda a: conv(a, w, s, p), x)
            g = jax.random.normal(_key(2), y.shape, DT)
            def f(gv, a, b):
                _, pull = jax.vjp(lambda xv, wv: op(xv, wv, None, s, p),
                                  a, b)
                return pull(gv)
            args = (g, x, w)
        else:
            f, args = (lambda a, b: op(a, b, None, s, p)), (x, w)
    else:
        y = jax.eval_shape(lambda a: conv(a, w, s, p), x)
        g = jax.random.normal(_key(2), y.shape, DT)
        if mode == "vjp":
            # g must be the varied arg or XLA hoists the whole backward
            # out of the scan (measured: negative slopes); the forward
            # inside jax.vjp is loop-invariant and hoists away, leaving
            # exactly dx+dw in the loop.
            def f(gv, a, b):
                _, pull = jax.vjp(lambda xv, wv: conv(xv, wv, s, p), a, b)
                return pull(gv)
            args = (g, x, w)
        elif mode == "dx":
            # dx of conv(s, p) = lhs-dilated conv of g with flipped w
            wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
            k = wshape[0]
            f, args = (lambda a, b: convT(a, b, s, k - 1 - p)), (g, wf)
        elif mode == "dw":
            def f(a, b):
                _, pull = jax.vjp(lambda wv: conv(a, wv, s, p), b)
                return pull(g)[0]
            args = (x, w)
        else:
            raise ValueError(mode)
    # per-call MACs*2
    kh, kw, ci, co = wshape
    if mode in ("convt",):
        n, ih, iw, _ = xshape
        flops = 2 * ih * iw * kh * kw * ci * co
    else:
        yshape = jax.eval_shape(lambda a, b: conv(a, b, s, p), x, w).shape
        flops = 2 * yshape[1] * yshape[2] * kh * kw * ci * co
        if mode == "vjp":
            flops *= 2
    return f, args, flops


def slope_time(f, args, n1=32, n2=288):
    """Per-call seconds via two-scan-length slope; value fetch barrier."""
    def run(n):
        def body(c, _):
            a0 = args[0] + c.astype(args[0].dtype)
            y = f(a0, *args[1:])
            # consume EVERY output element: a slice here lets XLA narrow
            # the conv itself (measured: negative slopes from 1-pixel convs)
            tot = sum(jnp.sum(t.astype(jnp.float32))
                      for t in jax.tree_util.tree_leaves(y))
            return tot * jnp.float32(1e-30), None
        return lax.scan(body, jnp.float32(0.0), None, length=n)[0]

    g = jax.jit(run, static_argnums=0)
    float(g(n1))              # compile both lengths
    float(g(n2))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(g(n1)); t1 = time.perf_counter()
        float(g(n2)); t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return min(ts)


CASES = {
    # name: (xshape, wshape, stride, pad, mode)
    # D2 PatchGAN stride-1 tail (biggest single fwd FLOP block, 18%)
    "k4s1_64px_256_512":   ((1, 64, 64, 256), (4, 4, 256, 512), 1, 1, "fwd"),
    "k4s1_32px_512_512":   ((1, 32, 32, 512), (4, 4, 512, 512), 1, 1, "fwd"),
    "k4s1_head_63px":      ((1, 63, 63, 512), (4, 4, 512, 1), 1, 1, "fwd"),
    # D downsampling stack
    "k4s2_512px_3_64":     ((1, 512, 512, 3), (4, 4, 3, 64), 2, 1, "fwd"),
    "k4s2_256px_64_128":   ((1, 256, 256, 64), (4, 4, 64, 128), 2, 1, "fwd"),
    "k4s2_128px_128_256":  ((1, 128, 128, 128), (4, 4, 128, 256), 2, 1, "fwd"),
    "k4s2_64px_256_512":   ((1, 64, 64, 256), (4, 4, 256, 512), 2, 1, "fwd"),
    # CRN 3x3 (XLA side; pallas kernel covers >=512px)
    "k3s1_256px_64_64":    ((1, 256, 256, 64), (3, 3, 64, 64), 1, 1, "fwd"),
    "k3s1_256px_128_64":   ((1, 256, 256, 128), (3, 3, 128, 64), 1, 1, "fwd"),
    "k3s1_512px_64_1":     ((1, 512, 512, 64), (3, 3, 64, 1), 1, 1, "fwd"),
    # G1/F2 convT (lhs-dilated — XLA weak spot)
    "convT_16px_512_256":  ((1, 16, 16, 512), (4, 4, 512, 256), 2, 1, "convt"),
    "convT_32px_512_128":  ((1, 32, 32, 512), (4, 4, 512, 128), 2, 1, "convt"),
    "convT_64px_256_64":   ((1, 64, 64, 256), (4, 4, 256, 64), 2, 1, "convt"),
    "convT_128px_128_32":  ((1, 128, 128, 128), (4, 4, 128, 32), 2, 1, "convt"),
    "convT_256px_64_2":    ((1, 256, 256, 64), (4, 4, 64, 2), 2, 1, "convt"),
    # backward pieces of the dominant fwd convs
    "vjp_k4s2_256px_64_128":  ((1, 256, 256, 64), (4, 4, 64, 128), 2, 1, "vjp"),
    "dx_k4s2_256px_64_128":   ((1, 256, 256, 64), (4, 4, 64, 128), 2, 1, "dx"),
    "dw_k4s2_256px_64_128":   ((1, 256, 256, 64), (4, 4, 64, 128), 2, 1, "dw"),
    "vjp_k4s1_64px_256_512":  ((1, 64, 64, 256), (4, 4, 256, 512), 1, 1, "vjp"),
    "vjp_k4s2_128px_128_256": ((1, 128, 128, 128), (4, 4, 128, 256), 2, 1, "vjp"),
    # edge convs with starved lanes (Ci=3 D stems, Co=1/2 heads)
    "vjp_k4s2_512px_3_64":    ((1, 512, 512, 3), (4, 4, 3, 64), 2, 1, "vjp"),
    "vjp_k3s1_512px_64_1":    ((1, 512, 512, 64), (3, 3, 64, 1), 1, 1, "vjp"),
    "vjp_k3s1_256px_64_64":   ((1, 256, 256, 64), (3, 3, 64, 64), 1, 1, "vjp"),
    "vjp_k4s1_head_63px":     ((1, 63, 63, 512), (4, 4, 512, 1), 1, 1, "vjp"),
    "k4s2_256px_2_32":        ((1, 256, 256, 2), (4, 4, 2, 32), 2, 1, "fwd"),
    "k3s1_256px_2_64":        ((1, 256, 256, 2), (3, 3, 2, 64), 1, 1, "fwd"),
    # pallas convt4s2 kernel (A/B against the convT_* cases above)
    "pconvT_16px_512_256":  ((1, 16, 16, 512), (4, 4, 512, 256), 2, 1, "pconvt"),
    "pconvT_32px_512_128":  ((1, 32, 32, 512), (4, 4, 512, 128), 2, 1, "pconvt"),
    "pconvT_64px_256_64":   ((1, 64, 64, 256), (4, 4, 256, 64), 2, 1, "pconvt"),
    "pconvT_128px_128_32":  ((1, 128, 128, 128), (4, 4, 128, 32), 2, 1, "pconvt"),
    "pdx_k4s2_256px_64_128": ((1, 128, 128, 128), (4, 4, 128, 64), 2, 1, "pconvt"),
    "pdx_k4s2_128px_128_256": ((1, 64, 64, 256), (4, 4, 256, 128), 2, 1, "pconvt"),
    "dxonly_k4s2_128px_128_256": ((1, 128, 128, 128), (4, 4, 128, 256), 2, 1, "dx"),
    # edge_conv reformulations (A/B against the same-shape XLA cases)
    "hd_k3s1_512px_64_1":    ((1, 512, 512, 64), (3, 3, 64, 1), 1, 1, "head"),
    "hdvjp_k3s1_512px_64_1": ((1, 512, 512, 64), (3, 3, 64, 1), 1, 1, "headvjp"),
    "st_k4s2_512px_3_64":    ((1, 512, 512, 3), (4, 4, 3, 64), 2, 1, "stem"),
    "stvjp_k4s2_512px_3_64": ((1, 512, 512, 3), (4, 4, 3, 64), 2, 1, "stemvjp"),
    "st_k4s2_256px_2_32":    ((1, 256, 256, 2), (4, 4, 2, 32), 2, 1, "stem"),
    "st_k3s1_256px_2_64":    ((1, 256, 256, 2), (3, 3, 2, 64), 1, 1, "stem"),
    "hd_k4s1_head_63px":     ((1, 63, 63, 512), (4, 4, 512, 1), 1, 1, "head"),
    "hdvjp_k4s1_head_63px":  ((1, 63, 63, 512), (4, 4, 512, 1), 1, 1, "headvjp"),
    "hct_convT_256px_64_2":  ((1, 256, 256, 64), (4, 4, 64, 2), 2, 1, "hconvt"),
    "hctvjp_convT_256px_64_2": ((1, 256, 256, 64), (4, 4, 64, 2), 2, 1, "hconvtvjp"),
    "convTvjp_256px_64_2":   ((1, 256, 256, 64), (4, 4, 64, 2), 2, 1, "convtvjp"),
    "dw_k3s1_256px_64_64":   ((1, 256, 256, 64), (3, 3, 64, 64), 1, 1, "dw"),
    "dw_k3s1_512px_64_64":   ((1, 512, 512, 64), (3, 3, 64, 64), 1, 1, "dw"),
    "p3dw2_k3s1_512px_64_64": ((1, 512, 512, 64), (3, 3, 64, 64), 1, 1, "p3dw2"),
    "p3dw2_k3s1_256px_64_64": ((1, 256, 256, 64), (3, 3, 64, 64), 1, 1, "p3dw2"),
    "mid_k3s1_256px_64_64":  ((1, 256, 256, 64), (3, 3, 64, 64), 1, 1, "mid"),
    "midvjp_k3s1_256px_64_64": ((1, 256, 256, 64), (3, 3, 64, 64), 1, 1, "midvjp"),
    "midvjp_k3s1_256px_128_64": ((1, 256, 256, 128), (3, 3, 128, 64), 1, 1, "midvjp"),
    "midvjp_k3s1_128px_64_64": ((1, 128, 128, 64), (3, 3, 64, 64), 1, 1, "midvjp"),
    # phase-major-input forms (A/B vs st_*/stvjp_* same shapes): the D1
    # stems fed by the G1 phase head, and the D2 512px pair stems
    "stph_k4s2_256px_2_32":    ((1, 256, 256, 2), (4, 4, 2, 32), 2, 1, "stemph"),
    "stphvjp_k4s2_256px_2_32": ((1, 256, 256, 2), (4, 4, 2, 32), 2, 1, "stemphvjp"),
    "stph_k4s2_512px_3_64":    ((1, 512, 512, 3), (4, 4, 3, 64), 2, 1, "stemph"),
    "stphvjp_k4s2_512px_3_64": ((1, 512, 512, 3), (4, 4, 3, 64), 2, 1, "stemphvjp"),
    # single-dot gcols dw (A/B vs dw_k3s1_* same shapes)
    "dwg_k3s1_256px_64_64":    ((1, 256, 256, 64), (3, 3, 64, 64), 1, 1, "dwgcols"),
    "dwg_k3s1_512px_64_64":    ((1, 512, 512, 64), (3, 3, 64, 64), 1, 1, "dwgcols"),
    # phase-input blur front-end (s field = scale_factor here)
    "blurph_256px_c2_x2":      ((1, 256, 256, 2), (1, 1, 2, 2), 2, 0, "blurph"),
}


def main(argv):
    if "--list" in argv:
        print("\n".join(CASES))
        return
    names = [a for a in argv if not a.startswith("-")] or list(CASES)
    print(f"{'case':26} {'ms':>8} {'GF':>7} {'TF/s':>6} {'%peak':>6}")
    peak = 394e12  # v5e bf16
    for name in names:
        xs, ws, s, p, mode = CASES[name]
        f, args, flops = make_conv_case(xs, ws, s, p, mode)
        t = slope_time(f, args)
        print(f"{name:26} {t*1e3:8.3f} {flops/1e9:7.2f} "
              f"{flops/t/1e12:6.2f} {100*flops/t/peak:6.1f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
