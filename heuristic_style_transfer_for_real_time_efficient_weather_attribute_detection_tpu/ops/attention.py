"""Attention ops: torch-compatible MHA, pre-norm transformer encoder, and the
stacked per-task attention poolings used by the three model families.

TPU-first design note: the reference loops over tasks in Python with one small
matmul per task (models_PMG.py:47-57, models_RTM.py:18-24).  Here every
per-task computation is *stacked over a task axis T* into a single batched
einsum, so the MXU sees one large contraction instead of 12 tiny ones and the
whole head fits a single XLA fusion.
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp

from .nn import linear
from .norms import layer_norm


def dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Inverted dropout (torch semantics: scale kept units by 1/keep).
    Identity when ``rng`` is None or rate == 0 (eval mode)."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    m = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(m, x / keep, 0.0).astype(x.dtype)


def multi_head_attention(
    x: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    num_heads: int,
    dropout_rate: float = 0.0,
    rng=None,
) -> jnp.ndarray:
    """Self-attention matching ``torch.nn.MultiheadAttention`` (batch_first).

    x: [B, N, D].  Params (converter splits torch's packed ``in_proj``):
    wq/wk/wv/wo: [D, D] input-major, bq/bk/bv/bo: [D].
    Torch scales q by 1/sqrt(head_dim) before the score matmul
    (reference transformer: models_PMG.py:60-72 via TransformerEncoderLayer).
    ``dropout_rate``/``rng`` enable torch's attention-probability dropout
    (train mode only).
    """
    b, n, d = x.shape
    h = num_heads
    hd = d // h

    def split(y):  # [B, N, D] -> [B, h, N, hd]
        return y.reshape(b, n, h, hd).transpose(0, 2, 1, 3)

    q = split(jnp.dot(x, p["wq"], preferred_element_type=jnp.float32) + p["bq"])
    k = split(jnp.dot(x, p["wk"], preferred_element_type=jnp.float32) + p["bk"])
    v = split(jnp.dot(x, p["wv"], preferred_element_type=jnp.float32) + p["bv"])

    q = q * (1.0 / math.sqrt(hd))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(scores, axis=-1)
    w = dropout(w, dropout_rate, rng)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    return (
        jnp.dot(o, p["wo"], preferred_element_type=jnp.float32) + p["bo"]
    ).astype(x.dtype)


def transformer_encoder(
    x: jnp.ndarray,
    layers: List[Dict],
    num_heads: int,
    dropout_rate: float = 0.0,
    rng=None,
) -> jnp.ndarray:
    """Pre-norm transformer encoder stack, ReLU FFN, no final norm.

    Matches ``nn.TransformerEncoder(TransformerEncoderLayer(norm_first=True))``
    — reference models_PMG.py:60-72, which hardcodes dropout=0.1 in train
    mode (models_PMG.py:146); pass ``dropout_rate``/``rng`` to reproduce its
    four dropout sites (attention probs, attn output, FFN inner, FFN output).
    Eval mode (rng=None) is dropout-free.  The token count is tiny
    (Np = patch_div^2 = 9..16) so flash attention is pointless; a single
    fused XLA computation is the right shape on TPU.
    """
    for li, p in enumerate(layers):
        if rng is not None:
            k_attn, k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, li), 4)
        else:
            k_attn = k1 = k2 = k3 = None
        h = layer_norm(x, p["norm1"])
        a = multi_head_attention(h, p["attn"], num_heads, dropout_rate, k_attn)
        x = x + dropout(a, dropout_rate, k1)
        h = layer_norm(x, p["norm2"])
        h = dropout(jax.nn.relu(linear(h, p["ffn1"])), dropout_rate, k2)
        x = x + dropout(linear(h, p["ffn2"]), dropout_rate, k3)
    return x


def task_query_pool(tokens: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """PMG task-conditioned pooling, stacked over tasks.

    tokens: [B, N, D]; queries: [T, D] (one learned query per task).
    scores_t = <tokens, q_t> softmaxed over N; pooled_t = sum_n w_n token_n.
    Reference: models_PMG.py:36-57 (``TaskAttentionPooling``) — note there is
    *no* 1/sqrt(d) scaling there, unlike RTM's head.
    Returns [B, T, D].
    """
    scores = jnp.einsum(
        "bnd,td->btn", tokens, queries, preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "btn,bnd->btd", w, tokens, preferred_element_type=jnp.float32
    ).astype(tokens.dtype)


def rtm_task_attention(
    tokens: jnp.ndarray, p: Dict[str, jnp.ndarray]
) -> jnp.ndarray:
    """RTM per-task query attention over spatial tokens, stacked over tasks.

    tokens: [B, N, C] (flattened H*W feature tokens).  Params stacked on a
    leading task axis T: ``proj_w`` [T, C, d], ``q`` [T, d], ``out_w`` [T, d, C].
    Per task: Tp = tokens @ proj; attn = softmax(q.Tp^T / sqrt(d));
    h = attn @ Tp; out = h @ out_w.  Reference: models_RTM.py:9-24.

    TPU-first reassociation: the projection is linear, so both uses of the
    [B,T,N,d] projected-token tensor factor away —
      scores[b,t,n] = <tokens[b,n], proj_w[t] @ q[t]>        (pq precomputed)
      h[b,t]        = (sum_n attn[b,t,n] tokens[b,n]) @ proj_w[t]
    i.e. pool in C-space FIRST.  With the reference defaults (d = C = 2048,
    N = 49) this removes a ~100 MB-per-100-images intermediate and turns the
    hot path into three dense [*, C] contractions.  Bit-level: pure
    reassociation (validated against the torch reference by the golden-logit
    fixtures).  Returns per-task embeddings [B, T, C].
    """
    d = p["q"].shape[-1]
    pq = jnp.einsum(
        "tcd,td->tc", p["proj_w"], p["q"], preferred_element_type=jnp.float32
    )
    scores = jnp.einsum(
        "bnc,tc->btn", tokens, pq, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(d))
    w = jax.nn.softmax(scores, axis=-1)
    pooled = jnp.einsum(
        "btn,bnc->btc", w, tokens, preferred_element_type=jnp.float32
    )
    h = jnp.einsum(
        "btc,tcd->btd", pooled, p["proj_w"], preferred_element_type=jnp.float32
    )
    return jnp.einsum(
        "btd,tdc->btc", h, p["out_w"], preferred_element_type=jnp.float32
    ).astype(tokens.dtype)


def stacked_task_heads(
    pooled: jnp.ndarray, p: Dict[str, jnp.ndarray]
) -> jnp.ndarray:
    """Per-task Linear classifiers as one batched matmul.

    pooled: [B, T, D]; p: {"w": [T, D, Kmax], "b": [T, Kmax]} where columns
    beyond each task's true class count are zero-padded (sliced off by
    ``TaskSpec.split_logits``).  Replaces the reference's ModuleDict of 12
    small Linears (models_PMG.py:153-155).
    """
    return (
        jnp.einsum("btd,tdk->btk", pooled, p["w"], preferred_element_type=jnp.float32)
        + p["b"]
    ).astype(jnp.promote_types(pooled.dtype, jnp.float32))
