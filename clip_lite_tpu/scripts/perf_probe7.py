"""Perf probe 7: BERT attention restructuring experiments (bs128, s=30).

Variants of a 12-layer BERT tower (fwd+bwd, rbg PRNG, bf16):
  baseline      — current models/bert.py layout (bqhd einsums)
  attn_identity — attention replaced by identity: ceiling for attention work
  bhsd_layout   — single (3,b,h,s,d) transpose after fused QKV; batched
                  dot_generals in (b,h) space; one transpose back
  bf16_softmax  — softmax computed in bf16 (precision experiment only)
  scan_layers   — lax.scan over stacked layer params

Appends to /tmp/perf_probe7.jsonl.
"""

from __future__ import annotations

import json
import math
import time

import numpy as np

OUT = "/tmp/perf_probe7.jsonl"


def report(name, **kw):
    rec = {"name": name, **kw}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_default_prng_impl", "rbg")
    rng = np.random.RandomState(0)
    B, S, H, NH = 128, 30, 768, 12
    HD = H // NH
    ids = np.asarray(rng.randint(0, 30522, (B, S)), np.int32)
    mask = np.ones((B, S), np.int32)

    class Layer(nn.Module):
        variant: str = "baseline"
        dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x, attn_bias, deterministic=False):
            xin = x.astype(self.dtype)
            qkv = nn.Dense(3 * H, dtype=self.dtype, param_dtype=jnp.float32,
                           name="qkv")(xin)
            b, s, _ = x.shape
            if self.variant == "attn_identity":
                q, k, v = jnp.split(qkv, 3, axis=-1)
                ctx = v + 0 * q[:, :1] + 0 * k[:, :1]
            elif self.variant in ("bhsd_layout", "bf16_softmax"):
                sm_dtype = (jnp.bfloat16 if self.variant == "bf16_softmax"
                            else jnp.float32)
                qkv = qkv.reshape(b, s, 3, NH, HD)
                qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, b, h, s, d)
                q, k, v = qkv[0], qkv[1], qkv[2]
                scores = jax.lax.dot_general(
                    q, k, (((3,), (3,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32)
                scores = scores / math.sqrt(HD) + attn_bias
                probs = jax.nn.softmax(scores.astype(sm_dtype), axis=-1)
                probs = nn.Dropout(0.1, deterministic=deterministic)(probs)
                ctx = jax.lax.dot_general(
                    probs.astype(self.dtype), v,
                    (((3,), (2,)), ((0, 1), (0, 1))))  # (b,h,q,d)
                ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, H)
            else:  # baseline: current bert.py structure
                q, k, v = jnp.split(qkv, 3, axis=-1)
                q = q.reshape(b, s, NH, HD)
                k = k.reshape(b, s, NH, HD)
                v = v.reshape(b, s, NH, HD)
                scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                    preferred_element_type=jnp.float32)
                scores = scores / math.sqrt(HD) + attn_bias
                probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
                probs = nn.Dropout(0.1, deterministic=deterministic)(probs)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(self.dtype),
                                 v, preferred_element_type=self.dtype)
                ctx = ctx.reshape(b, s, H)

            attn_out = nn.Dense(H, dtype=self.dtype, param_dtype=jnp.float32,
                                name="attn_out")(ctx)
            attn_out = nn.Dropout(0.1, deterministic=deterministic)(attn_out)
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="attn_ln")(xin + attn_out)
            inter = nn.Dense(4 * H, dtype=self.dtype, param_dtype=jnp.float32,
                             name="intermediate")(x)
            inter = nn.gelu(inter, approximate=False)
            out = nn.Dense(H, dtype=self.dtype, param_dtype=jnp.float32,
                           name="output")(inter)
            out = nn.Dropout(0.1, deterministic=deterministic)(out)
            return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name="out_ln")(x + out)

    class Tower(nn.Module):
        variant: str = "baseline"
        scan: bool = False

        @nn.compact
        def __call__(self, input_ids, attention_mask, deterministic=False):
            attn_bias = (1.0 - attention_mask[:, None, None, :].astype(
                jnp.float32)) * -1e9
            emb = nn.Embed(30522, H, param_dtype=jnp.float32,
                           name="word")(input_ids)
            pos = nn.Embed(512, H, param_dtype=jnp.float32, name="position")(
                jnp.arange(S)[None, :])
            x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                             name="ln")((emb + pos).astype(jnp.float32))
            x = nn.Dropout(0.1, deterministic=deterministic)(x)
            x = x.astype(jnp.bfloat16)
            if self.scan:
                ScanLayer = nn.scan(
                    Layer, variable_axes={"params": 0}, split_rngs={
                        "params": True, "dropout": True},
                    in_axes=nn.broadcast, length=12,
                    metadata_params={nn.meta.PARTITION_NAME: None})
                x = ScanLayer(variant=self.variant, name="layers")(
                    x, attn_bias, deterministic)
            else:
                for i in range(12):
                    x = Layer(variant=self.variant, name=f"layer_{i}")(
                        x, attn_bias, deterministic)
            return x.astype(jnp.float32)

    def run(name, variant, scan=False, n=15):
        model = Tower(variant=variant, scan=scan)
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(9)}, ids, mask)["params"]

        def loss(p, k):
            return jnp.sum(model.apply({"params": p}, ids, mask,
                                       deterministic=False,
                                       rngs={"dropout": k}))

        g = jax.jit(jax.grad(loss))
        k = jax.random.PRNGKey(1)
        o = g(params, k)
        o = g(params, k)
        _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(n):
            o = g(params, k)
        _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
        report(name, ms=round((time.perf_counter() - t0) / n * 1e3, 2))

    run("baseline", "baseline")
    run("attn_identity", "attn_identity")
    run("bhsd_layout", "bhsd_layout")
    run("bf16_softmax", "bf16_softmax")
    run("scan_layers", "baseline", scan=True)
    report("done")


if __name__ == "__main__":
    main()
