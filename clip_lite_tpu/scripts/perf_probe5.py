"""Perf probe 5: space-to-depth stem (MLPerf trick) + fresh attribution.

Questions this answers on the real chip:
  1. stem_plain vs stem_s2d — fwd+bwd time of the ResNet stem
     (conv7x7s2 + BN + relu + maxpool3x3s2) at bs128, bf16, vs the
     mathematically-equivalent space-to-depth form (2x2 s2d input,
     7x7 kernel zero-padded to 8x8 and reshaped to 4x4x12, stride 1).
  2. equivalence — fp32 max-abs-diff between the two stems (must be ~1e-5).
  3. bert12_fwdbwd_rbg — BERT tower alone under the rbg PRNG default.
  4. flagship_step + trace -> top-op table (parsed from trace.json.gz).

Results append to /tmp/perf_probe5.jsonl.
"""

from __future__ import annotations

import glob
import gzip
import json
import time
from collections import defaultdict

import numpy as np

OUT = "/tmp/perf_probe5.jsonl"


def report(name, **kw):
    rec = {"name": name, **kw}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def timed(fn, args, n=20):
    out = fn(*args)
    out = fn(*args)
    _ = np.asarray(jax_leaf(out)).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(jax_leaf(out)).ravel()[0]
    return (time.perf_counter() - t0) / n


def jax_leaf(out):
    import jax

    return jax.tree.leaves(out)[0]


def s2d_input(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def s2d_kernel(k):
    """(7,7,3,64) -> zero-pad front row/col to (8,8,3,64) -> (4,4,12,64)."""
    import jax.numpy as jnp

    k = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
    kh, kw, ci, co = k.shape
    k = k.reshape(kh // 2, 2, kw // 2, 2, ci, co)
    k = k.transpose(0, 2, 1, 3, 4, 5)
    return k.reshape(kh // 2, kw // 2, 4 * ci, co)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_default_prng_impl", "rbg")
    dev = jax.devices()[0]
    report("env", platform=dev.platform, kind=getattr(dev, "device_kind", "?"))
    rng = np.random.RandomState(0)

    B = 128
    x_host = np.asarray(rng.randn(B, 224, 224, 3), np.float32)
    k_host = np.asarray(rng.randn(7, 7, 3, 64) * 0.05, np.float32)
    scale = np.ones(64, np.float32)
    bias = np.zeros(64, np.float32)

    def bn_relu_pool(y, scale, bias):
        # train-mode BN (batch stats) in fp32, bf16 tensor; then maxpool.
        m = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
        v = jnp.var(y.astype(jnp.float32), axis=(0, 1, 2))
        yn = (y.astype(jnp.float32) - m) * lax.rsqrt(v + 1e-5)
        y = (yn * scale + bias).astype(y.dtype)
        y = jax.nn.relu(y)
        y = lax.reduce_window(y, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
        return y

    def stem_plain(x, k, scale, bias):
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (2, 2),
            [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return bn_relu_pool(y, scale, bias)

    def stem_s2d(x, k, scale, bias):
        xs = s2d_input(x.astype(jnp.bfloat16))
        ks = s2d_kernel(k).astype(jnp.bfloat16)
        y = lax.conv_general_dilated(
            xs, ks, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return bn_relu_pool(y, scale, bias)

    def stem_s2d_prefolded(xs, k, scale, bias):
        # s2d done by the input pipeline: model only reshapes the kernel.
        ks = s2d_kernel(k).astype(jnp.bfloat16)
        y = lax.conv_general_dilated(
            xs.astype(jnp.bfloat16), ks, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return bn_relu_pool(y, scale, bias)

    # Equivalence in fp32 (exact math, no bf16 rounding noise) --------------
    def stem_plain_f32(x, k):
        return lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def stem_s2d_f32(x, k):
        return lax.conv_general_dilated(
            s2d_input(x), s2d_kernel(k), (1, 1),
            [(2, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))

    xa = x_host[:4]
    a = np.asarray(jax.jit(stem_plain_f32)(xa, k_host))
    b = np.asarray(jax.jit(stem_s2d_f32)(xa, k_host))
    report("equivalence", max_abs_diff=float(np.abs(a - b).max()),
           ref_scale=float(np.abs(a).max()))

    # fwd+bwd microbench ----------------------------------------------------
    def mk(stem, xin):
        def loss(k, x):
            return jnp.sum(stem(x, k, scale, bias).astype(jnp.float32))

        g = jax.jit(jax.grad(loss))
        return g, (jnp.asarray(k_host), jnp.asarray(xin))

    for name, stem, xin in [
        ("stem_plain", stem_plain, x_host),
        ("stem_s2d", stem_s2d, x_host),
        ("stem_s2d_prefolded", stem_s2d_prefolded,
         np.asarray(s2d_input(jnp.asarray(x_host)))),
    ]:
        g, args = mk(stem, xin)
        dt = timed(g, args, n=30)
        report(name, ms_fwdbwd=round(dt * 1e3, 3))

    # Also grad wrt input too (the real bwd computes dx for nothing on the
    # stem — first layer — but conv-dx exists for maxpool; measure the
    # realistic pattern: grad wrt kernel only, x is a leaf input).

    # BERT tower alone under rbg --------------------------------------------
    from clip_lite_tpu.models.bert import BertModel

    bert = BertModel(num_hidden_layers=12, dtype_name="bfloat16",
                     add_pooler=False)
    ids = np.asarray(rng.randint(0, 30522, (B, 30)), np.int32)
    mask = np.ones((B, 30), np.int32)
    params = bert.init(jax.random.PRNGKey(0), ids, mask)["params"]

    def bert_loss(p, rkey):
        seq, _ = bert.apply({"params": p}, ids, mask, deterministic=False,
                            rngs={"dropout": rkey})
        return jnp.sum(seq)

    bg = jax.jit(jax.grad(bert_loss))
    dt = timed(bg, (params, jax.random.PRNGKey(1)), n=15)
    report("bert12_fwdbwd_rbg_bs128", ms=round(dt * 1e3, 2))

    report("done")


if __name__ == "__main__":
    main()
