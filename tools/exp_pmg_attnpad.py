#!/usr/bin/env python
"""EXPERIMENT: pad the PMG token axis for layout-friendlier attention.

Motivation (results/roofline.json, pmg_bf16_b512 top ops): the two
transformer attention-softmax fusions cost 74 us EACH on [512, 4, 9, 9]
scores — more than the gram contraction — and the query-pool softmax is in
the same regime.  A 9-wide minor dim occupies 9 of 128 lanes and 2 ragged
sublanes, so these fusions run at ~2% of HBM speed.  Padding the token
axis to a tile-friendly size with additive -inf key masks is EXACT for the
real tokens (pads are masked out of every softmax; LayerNorm/FFN are
per-token, so pad-row garbage never reaches a real output).

Protocol: full-forward device time (trace-derived, iters>=20) at batch 512
on the packed wire format, vs the shipped apply_packed baseline; parity
(prob drift + argmax) checked per variant.  Usage:
    python tools/exp_pmg_attnpad.py [--parity]
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true",
                    help="parity-only run (CPU-friendly)")
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    if args.parity:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    import bench
    import wadt.models.pmg as pmg
    from wadt.config import enable_persistent_compilation_cache
    from wadt.ops.attention import stacked_task_heads
    from wadt.ops.gram import patch_gram_tokens
    from wadt.ops.nn import linear
    from wadt.ops.norms import layer_norm
    from wadt.ops.preprocess import s2d_pack_uint8

    if not args.parity:
        from wadt.utils.devtime import device_time_ms

        enable_persistent_compilation_cache()

    mod, spec, params = bench.build("pmg")
    k = spec.plan[0].kernel
    heads = spec.transformer_heads
    d = spec.d_model

    def head_padded(feats, n_pad, flat=False, pad_pool=True, pad_tx=True):
        """``flat``: merge (B, heads) into one leading dim for the score
        softmaxes ([B*h, np, np] instead of [B, h, np, np]); ``pad_tx`` /
        ``pad_pool``: apply the padding to the transformer attention / the
        query pooling (isolates which softmax carries the cost)."""
        if spec.use_channel_attention:  # match apply_packed's head_apply
            from wadt.ops.nn import se_block

            feats = se_block(feats, params["se"])
        z = pmg.conv2d(feats, params["chan_proj"])
        tokens = patch_gram_tokens(z, spec.patch_div)
        tokens = linear(tokens, params["token_proj"])  # [B, n, d]
        b, n, _ = tokens.shape
        n_tx = n_pad if pad_tx else n
        if n_tx > n:
            tokens = jnp.pad(tokens, ((0, 0), (0, n_tx - n), (0, 0)))
        kmask = jnp.where(jnp.arange(n_tx) < n, 0.0, -1e30).astype(jnp.float32)
        hd = d // heads
        for p in params["transformer"]:
            h = layer_norm(tokens, p["norm1"])
            a = p["attn"]

            def split(y):
                y = y.reshape(b, n_tx, heads, hd).transpose(0, 2, 1, 3)
                return y.reshape(b * heads, n_tx, hd) if flat else y

            q = split(jnp.dot(h, a["wq"], preferred_element_type=jnp.float32) + a["bq"])
            kk = split(jnp.dot(h, a["wk"], preferred_element_type=jnp.float32) + a["bk"])
            v = split(jnp.dot(h, a["wv"], preferred_element_type=jnp.float32) + a["bv"])
            q = q * (1.0 / math.sqrt(hd))
            if flat:
                s = jnp.einsum("zqd,zkd->zqk", q, kk,
                               preferred_element_type=jnp.float32)
                w = jax.nn.softmax(s + kmask[None, None, :], axis=-1)
                o = jnp.einsum("zqk,zkd->zqd", w, v,
                               preferred_element_type=jnp.float32)
                o = o.reshape(b, heads, n_tx, hd)
            else:
                s = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                               preferred_element_type=jnp.float32)
                w = jax.nn.softmax(s + kmask[None, None, None, :], axis=-1)
                o = jnp.einsum("bhqk,bhkd->bhqd", w, v,
                               preferred_element_type=jnp.float32)
            o = o.transpose(0, 2, 1, 3).reshape(b, n_tx, d)
            tokens = tokens + (
                jnp.dot(o, a["wo"], preferred_element_type=jnp.float32) + a["bo"]
            ).astype(tokens.dtype)
            h = layer_norm(tokens, p["norm2"])
            h = jax.nn.relu(linear(h, p["ffn1"]))
            tokens = tokens + linear(h, p["ffn2"])
        n_pool = n_pad if pad_pool else n_tx
        if n_pool > tokens.shape[1]:
            tokens = jnp.pad(
                tokens, ((0, 0), (0, n_pool - tokens.shape[1]), (0, 0)))
        elif n_pool < tokens.shape[1]:
            tokens = tokens[:, :n_pool]
        pmask = jnp.where(jnp.arange(n_pool) < n, 0.0, -1e30).astype(jnp.float32)
        s = jnp.einsum("bnd,td->btn", tokens, params["queries"],
                       preferred_element_type=jnp.float32)
        w = jax.nn.softmax(s + pmask[None, None, :], axis=-1)
        pooled = jnp.einsum("btn,bnd->btd", w, tokens,
                            preferred_element_type=jnp.float32).astype(tokens.dtype)
        return stacked_task_heads(pooled, params["heads"])

    def packed_trunk(z8):
        """apply_packed's trunk (shared fold: pmg.packed_trunk_features)."""
        return pmg.packed_trunk_features(params, z8, spec)

    def make_padded(n_pad, **kw):
        def fwd(z8):
            return head_padded(packed_trunk(z8), n_pad, **kw)

        return jax.jit(fwd)

    def make_base():
        def fwd(z8):
            logits, _ = pmg.apply_packed(params, z8, spec)
            return logits

        return jax.jit(fwd)

    rng = np.random.RandomState(0)
    batch = 16 if args.parity else args.batch
    raw = rng.randint(0, 256, (batch, 224, 224, 3), np.uint8)
    z8 = jax.device_put(s2d_pack_uint8(raw, k))
    base = make_base()
    lb = np.asarray(base(z8))
    pb = np.asarray(jax.nn.softmax(lb, -1))
    if not args.parity:
        tb, topb = device_time_ms(base, z8, iters=20)
        print(f"[attnpad] batch {batch} baseline: {tb*1e3:.1f} us "
              f"({batch/tb*1e3:.0f} img/s)")
        for us, name in topb[:4]:
            print(f"    {us*1e3:8.1f} us  {name[:100]}")
    n_tokens = spec.patch_div ** 2
    variants = [
        (f"n_pad {n}", dict(n_pad=n)) for n in (n_tokens, 16, 32, 128)
    ] + [
        ("flat (no pad)", dict(n_pad=n_tokens, flat=True)),
        ("flat + pad 16", dict(n_pad=16, flat=True)),
        ("pad 16 tx-only", dict(n_pad=16, pad_pool=False)),
        ("pad 16 pool-only", dict(n_pad=16, pad_tx=False)),
    ]
    for label, kw in variants:
        fn = make_padded(**kw)
        lf = np.asarray(fn(z8))
        pf = np.asarray(jax.nn.softmax(lf, -1))
        drift = float(np.max(np.abs(pb - pf)))
        am = bool(np.array_equal(np.argmax(lb, -1), np.argmax(lf, -1)))
        if args.parity:
            print(f"[attnpad --parity] {label}: drift {drift:.2e} "
                  f"argmax_equal={am}")
            continue
        tf, topf = device_time_ms(fn, z8, iters=20)
        print(f"[attnpad] {label:17s}: {tf*1e3:.1f} us ({tb/tf:.3f}x) "
              f"drift {drift:.2e} argmax_equal={am}")
        for us, name in topf[:3]:
            print(f"    {us*1e3:8.1f} us  {name[:100]}")


if __name__ == "__main__":
    main()
