"""Windowed multi-head self-attention — the Swin encoder's hot op.

The reference outsources this to timm (reference models/swin_transformer.py:
19-24); here it is a first-class op with two interchangeable backends:

  * ``window_attention_xla``    — pure jnp/einsum, runs anywhere (reference
                                  semantics: scale, relative-position bias,
                                  shifted-window additive mask, softmax).
  * ``window_attention_pallas`` — fused Pallas TPU kernel (see
                                  swinvox_tpu/ops/pallas_window_attention.py)
                                  that keeps the whole score matrix in VMEM.

Shapes (channels-last, windows flattened into the batch axis):
  q, k, v  : [nW, heads, T, head_dim]   (T = window_size^2 tokens)
  rel_bias : [heads, T, T]              (broadcast over windows)
  mask     : [nW_per_image, T, T] or None (additive; tiled over the batch)

Returns [nW, heads, T, head_dim] in q.dtype; softmax is computed in float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def window_attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    nw, heads, tokens, head_dim = q.shape
    if scale is None:
        scale = head_dim**-0.5
    scores = jnp.einsum(
        "whtd,whsd->whts", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale + rel_bias[None].astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        nw_per_image = m.shape[0]
        scores = scores.reshape(
            nw // nw_per_image, nw_per_image, heads, tokens, tokens
        )
        scores = scores + m[None, :, None]
        scores = scores.reshape(nw, heads, tokens, tokens)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "whts,whsd->whtd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    use_pallas: bool = False,
) -> jax.Array:
    """Dispatch to the Pallas kernel on TPU, else the XLA path."""
    if use_pallas and jax.default_backend() == "tpu":
        try:
            from swinvox_tpu.ops.pallas_window_attention import (
                window_attention_pallas,
            )
        except ImportError:
            pass
        else:
            return window_attention_pallas(q, k, v, rel_bias, mask, scale)
    return window_attention_xla(q, k, v, rel_bias, mask, scale)
