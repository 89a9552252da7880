"""CLIP / OpenCLIP text encoder in Flax — the SD prompt embedder.

The reference gets prompt embeddings through the HF pipeline's CLIP text
model (/root/reference/src/modules/edit.py:505-522 _get_prompt_emb). Here
the tower is implemented directly (token + position embeddings, pre-LN
transformer with a causal mask, final LN) so the whole prompt-embedding path
is a jittable pure function; weights convert from the torch checkpoint via
the generic converter.

Tokenization is pluggable: `tokenize` uses the real CLIP BPE when a local
tokenizer is available (transformers, offline files) and otherwise falls
back to a deterministic hash tokenizer — embeddings are then random-model-
consistent, which is exactly what the offline random-init pipelines need.
"""

from __future__ import annotations

import hashlib
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .configs import CLIPTextConfig


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    # HF 'gelu' is the exact erf form (flax defaults to the tanh approx)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, mask):
        b, s, c = x.shape
        hd = c // self.num_heads
        dense = lambda name: nn.Dense(c, dtype=self.dtype,
                                      precision=self.precision, name=name)
        q = dense("q_proj")(x).reshape(b, s, self.num_heads, hd)
        k = dense("k_proj")(x).reshape(b, s, self.num_heads, hd)
        v = dense("v_proj")(x).reshape(b, s, self.num_heads, hd)
        scale = hd ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32,
                            precision=self.precision) * scale
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(x.dtype), v,
                         preferred_element_type=jnp.float32,
                         precision=self.precision)
        return dense("out_proj")(out.reshape(b, s, c))


class CLIPLayer(nn.Module):
    num_heads: int
    intermediate_size: int
    hidden_act: str
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, mask):
        c = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.num_heads, dtype=self.dtype,
                              precision=self.precision, name="self_attn")(h, mask)
        h = nn.LayerNorm(dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                     precision=self.precision, name="fc1")(h)
        h = _act(self.hidden_act)(h)
        h = nn.Dense(c, dtype=self.dtype, precision=self.precision,
                     name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, return_pooled: bool = False,
                 penultimate: bool = False):
        """(B, L) int32 token ids → (B, L, hidden) final hidden states.

        ``return_pooled`` additionally returns the projected EOS-token
        feature (the pooled text embedding SDXL's addition path consumes) —
        (hidden, pooled) tuple; eos is taken as the argmax token id per the
        CLIP convention (eos has the highest id in the CLIP vocab; the hash
        tokenizer uses id 1 with pad 2, so we locate the first eos instead).

        ``penultimate`` returns the second-to-last layer's output *without*
        the final LayerNorm (HF hidden_states[-2]) — the context SDXL's two
        towers feed the UNet; the pooled feature still comes from the full
        normalized tower.
        """
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=dtype,
                       name="token_embedding")(input_ids)
        pos_ids = jnp.arange(s)[None]
        pos = nn.Embed(cfg.max_length, cfg.hidden_size, dtype=dtype,
                       name="position_embedding")(pos_ids)
        x = tok + pos
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        x_penult = x
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                x_penult = x
            x = CLIPLayer(
                cfg.num_heads, cfg.intermediate_size, cfg.hidden_act,
                dtype=dtype, precision=cfg.precision, name=f"layers_{i}",
            )(x, causal)
        hidden = nn.LayerNorm(dtype=dtype, name="final_layer_norm")(x)
        if penultimate and not return_pooled:
            return x_penult
        if not return_pooled:
            return hidden
        eos_pos = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1
        )
        pooled = hidden[jnp.arange(b), eos_pos]
        pooled = nn.Dense(cfg.hidden_size, use_bias=False, dtype=dtype,
                          name="text_projection")(pooled)
        return (x_penult if penultimate else hidden), pooled


# ---- tokenization ---------------------------------------------------------

class HashTokenizer:
    """Deterministic offline stand-in for the CLIP BPE tokenizer.

    Maps each whitespace word to a stable id in [3, vocab). Real prompt
    *semantics* require real weights anyway; with random-init models this
    keeps distinct prompts → distinct, reproducible embeddings (and the
    empty prompt → pure padding), which is what the offline pipelines and
    tests need.
    """

    def __init__(self, vocab_size: int, max_length: int):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.bos, self.eos, self.pad = 0, 1, 2

    def __call__(self, prompts: List[str]) -> np.ndarray:
        out = np.full((len(prompts), self.max_length), self.pad, np.int32)
        for i, p in enumerate(prompts):
            ids = [self.bos]
            for w in p.lower().split()[: self.max_length - 2]:
                hid = int.from_bytes(
                    hashlib.sha1(w.encode()).digest()[:4], "little"
                )
                ids.append(3 + hid % (self.vocab_size - 3))
            ids.append(self.eos)
            out[i, : len(ids)] = ids
        return out


def load_tokenizer(config: CLIPTextConfig, local_path: Optional[str] = None):
    """Real CLIPTokenizer from a local directory when available; otherwise
    the deterministic hash fallback (zero-egress environments)."""
    if local_path:
        try:
            from transformers import CLIPTokenizer

            tok = CLIPTokenizer.from_pretrained(local_path)
            return lambda prompts: np.asarray(
                tok(prompts, padding="max_length", truncation=True,
                    max_length=config.max_length, return_tensors="np").input_ids,
                np.int32,
            )
        except Exception:
            pass
    return HashTokenizer(config.vocab_size, config.max_length)
