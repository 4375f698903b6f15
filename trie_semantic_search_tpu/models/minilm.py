"""MiniLM sentence encoder — the framework's flagship model, in pure JAX.

Replaces the reference's stubbed ONNX embedding model
(``/root/reference/src/vector.rs:162-181`` returned ``vec![0.0; 768]``) with
a real BERT-family encoder producing 384-d sentence embeddings (the
BASELINE.json north star: "MiniLM 384-d JAX forward pass").

TPU-first design:
  * **Stacked layer parameters + ``lax.scan``** over layers: one compiled
    transformer block regardless of depth (fast compiles, natural pipeline-
    parallel axis if ever needed).
  * **bfloat16 compute** on the MXU with float32 layernorm/softmax/pooling;
    parameters stored float32.
  * **Static shapes**: inputs are fixed ``[B, L]`` int32; padding is masked,
    never sliced.
  * **Sharding**: :func:`param_partition_specs` returns a pytree of
    ``PartitionSpec`` for tensor parallelism over the ``model`` mesh axis
    (attention heads + FFN intermediate sharded); batch goes data-parallel
    over ``data``. MiniLM is small enough to replicate (SURVEY.md §2.1), so
    TP is off by default but fully supported for the training path.

Checkpoints: deterministic random init by default (zero-egress environment);
:func:`load_hf_checkpoint` maps a local HuggingFace
``sentence-transformers/all-MiniLM-L6-v2``-style checkpoint
(pytorch_model.bin / model.safetensors) onto the pytree when present.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

Params = dict[str, Any]


@dataclass(frozen=True)
class MiniLMConfig:
    """all-MiniLM-L6-v2 geometry (hidden 384 → 384-d embeddings)."""

    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


#: Named model geometries — the reference's two embedding model options
#: (``model_type`` "legal-bert" 768-d default vs the MiniLM 384-d target;
#: ref config.rs:218,559,571 + README.md:143). Same BERT-family forward.
MODEL_FAMILIES: dict[str, "MiniLMConfig"] = {
    "minilm-l6": MiniLMConfig(),
    "all-minilm-l6-v2": MiniLMConfig(),
    "legal-bert": MiniLMConfig(
        hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072
    ),
    "bert-base": MiniLMConfig(
        hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072
    ),
}


def config_for_model_type(model_type: str, vocab_size: int, max_position: int) -> "MiniLMConfig":
    """Resolve a named model family to its geometry (falls back to MiniLM)."""
    import dataclasses

    base = MODEL_FAMILIES.get(model_type.lower(), MiniLMConfig())
    return dataclasses.replace(
        base, vocab_size=vocab_size, max_position=max_position
    )


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, config: MiniLMConfig) -> Params:
    """Deterministic truncated-normal init (BERT-style, std 0.02)."""
    c = config
    k = iter(jax.random.split(rng, 16))

    def dense(key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
        return (jax.random.truncated_normal(key, -2, 2, shape, jnp.float32) * 0.02)

    H, I_, L = c.hidden_size, c.intermediate_size, c.num_layers
    lk = jax.random.split(next(k), 8)

    def stack(key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
        keys = jax.random.split(key, L)
        return jnp.stack([dense(keys[i], shape) for i in range(L)])

    return {
        "embeddings": {
            "word": dense(next(k), (c.vocab_size, H)),
            "position": dense(next(k), (c.max_position, H)),
            "token_type": dense(next(k), (c.type_vocab_size, H)),
            "ln_scale": jnp.ones((H,), jnp.float32),
            "ln_bias": jnp.zeros((H,), jnp.float32),
        },
        # Stacked per-layer params: leading dim = layer.
        "layers": {
            "q_kernel": stack(lk[0], (H, H)),
            "q_bias": jnp.zeros((L, H), jnp.float32),
            "k_kernel": stack(lk[1], (H, H)),
            "k_bias": jnp.zeros((L, H), jnp.float32),
            "v_kernel": stack(lk[2], (H, H)),
            "v_bias": jnp.zeros((L, H), jnp.float32),
            "o_kernel": stack(lk[3], (H, H)),
            "o_bias": jnp.zeros((L, H), jnp.float32),
            "attn_ln_scale": jnp.ones((L, H), jnp.float32),
            "attn_ln_bias": jnp.zeros((L, H), jnp.float32),
            "wi_kernel": stack(lk[4], (H, I_)),
            "wi_bias": jnp.zeros((L, I_), jnp.float32),
            "wo_kernel": stack(lk[5], (I_, H)),
            "wo_bias": jnp.zeros((L, H), jnp.float32),
            "mlp_ln_scale": jnp.ones((L, H), jnp.float32),
            "mlp_ln_bias": jnp.zeros((L, H), jnp.float32),
        },
    }


def param_partition_specs(config: MiniLMConfig) -> Params:
    """Tensor-parallel PartitionSpecs over the ``model`` mesh axis.

    Attention projections shard the head dimension (columns of q/k/v,
    rows of o); the FFN shards the intermediate dimension. Embeddings and
    layernorms replicate (tiny).
    """
    return {
        "embeddings": {
            "word": P(None, None),
            "position": P(None, None),
            "token_type": P(None, None),
            "ln_scale": P(None),
            "ln_bias": P(None),
        },
        "layers": {
            "q_kernel": P(None, None, "model"),
            "q_bias": P(None, "model"),
            "k_kernel": P(None, None, "model"),
            "k_bias": P(None, "model"),
            "v_kernel": P(None, None, "model"),
            "v_bias": P(None, "model"),
            "o_kernel": P(None, "model", None),
            "o_bias": P(None, None),
            "attn_ln_scale": P(None, None),
            "attn_ln_bias": P(None, None),
            "wi_kernel": P(None, None, "model"),
            "wi_bias": P(None, "model"),
            "wo_kernel": P(None, "model", None),
            "wo_bias": P(None, None),
            "mlp_ln_scale": P(None, None),
            "mlp_ln_bias": P(None, None),
        },
    }


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _encoder_layer(
    hidden: jax.Array,  # [B, L, H] bf16
    mask_bias: jax.Array,  # [B, 1, 1, L] f32 (0 / -inf-ish)
    lp: Params,  # this layer's params (sliced from the stack)
    config: MiniLMConfig,
) -> jax.Array:
    c = config
    B, Lq, H = hidden.shape
    nh, hd = c.num_heads, c.head_dim
    dt = hidden.dtype

    def proj(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
        return (
            jnp.einsum("blh,hk->blk", x, kernel.astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
            + bias.astype(dt)
        )

    q = proj(hidden, lp["q_kernel"], lp["q_bias"]).reshape(B, Lq, nh, hd)
    kk = proj(hidden, lp["k_kernel"], lp["k_bias"]).reshape(B, Lq, nh, hd)
    v = proj(hidden, lp["v_kernel"], lp["v_bias"]).reshape(B, Lq, nh, hd)

    scores = jnp.einsum("bqnd,bknd->bnqk", q, kk,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd) + mask_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(dt)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                     preferred_element_type=jnp.float32).astype(dt)
    ctx = ctx.reshape(B, Lq, H)
    attn_out = proj(ctx, lp["o_kernel"], lp["o_bias"])
    hidden = _layer_norm(
        hidden.astype(jnp.float32) + attn_out.astype(jnp.float32),
        lp["attn_ln_scale"], lp["attn_ln_bias"], c.layer_norm_eps,
    ).astype(dt)

    inter = proj(hidden, lp["wi_kernel"], lp["wi_bias"])
    inter = jax.nn.gelu(inter.astype(jnp.float32), approximate=True).astype(dt)
    mlp_out = proj(inter, lp["wo_kernel"], lp["wo_bias"])
    hidden = _layer_norm(
        hidden.astype(jnp.float32) + mlp_out.astype(jnp.float32),
        lp["mlp_ln_scale"], lp["mlp_ln_bias"], c.layer_norm_eps,
    ).astype(dt)
    return hidden


def forward(
    params: Params,
    input_ids: jax.Array,  # int32 [B, L]
    attention_mask: jax.Array,  # int32 [B, L]
    config: MiniLMConfig,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """Token-level hidden states ``[B, L, H]`` (float32)."""
    c = config
    B, L = input_ids.shape
    emb = params["embeddings"]
    positions = jnp.arange(L, dtype=jnp.int32)[None, :]
    hidden = (
        jnp.take(emb["word"], input_ids, axis=0)
        + jnp.take(emb["position"], positions, axis=0)
        + emb["token_type"][0][None, None, :]
    )
    hidden = _layer_norm(
        hidden, emb["ln_scale"], emb["ln_bias"], c.layer_norm_eps
    ).astype(compute_dtype)

    mask_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9

    def body(h: jax.Array, lp: Params) -> tuple[jax.Array, None]:
        return _encoder_layer(h, mask_bias, lp, c), None

    hidden, _ = jax.lax.scan(body, hidden, params["layers"])
    return hidden.astype(jnp.float32)


def encode(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    config: MiniLMConfig,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    token_weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Sentence embeddings ``[B, H]``: masked mean-pool + L2 normalise
    (the all-MiniLM-L6-v2 recipe).

    ``token_weights`` (``[vocab]`` f32, optional) switches the pool to a
    per-token weighted mean — the SIF recipe (Arora et al. 2017,
    ``w(t) = a / (a + p(t))``, see :func:`sif_weights_from_counts`): rare
    discriminative tokens dominate the sentence vector while corpus
    boilerplate ("the court held ...") washes out. Train-free, so it
    composes with any params (random init or pretrained); on
    template-heavy corpora it is the difference between ranking cases by
    their distinguishing content vs by shared template mass. The weight
    gather is one ``take`` fused into the f32 pooling epilogue — MXU work
    is unchanged."""
    hidden = forward(params, input_ids, attention_mask, config, compute_dtype)
    mask = attention_mask.astype(jnp.float32)
    if token_weights is not None:
        mask = mask * jnp.take(
            token_weights.astype(jnp.float32), input_ids, axis=0
        )
    mask = mask[:, :, None]
    summed = jnp.sum(hidden * mask, axis=1)
    counts = jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
    pooled = summed / counts
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
    )


def sif_weights_from_counts(
    counts: np.ndarray, a: float = 1e-3
) -> np.ndarray:
    """Smoothed-inverse-frequency pooling weights from corpus token-id
    counts: ``w(t) = a / (a + p(t))`` with ``p(t)`` the token's corpus
    probability. Unseen tokens get the maximum weight 1.0 (they are
    maximally informative when they appear in a query). Returns ``[vocab]``
    float32; the global scale is irrelevant (weighted-mean pooling
    normalises by the weight sum)."""
    counts = np.asarray(counts, np.float64)
    total = counts.sum()
    if total <= 0:
        return np.ones(counts.shape, np.float32)
    p = counts / total
    return (a / (a + p)).astype(np.float32)


def count_token_ids(
    tokenizer, texts, vocab_size: int, max_len: int = 512
) -> np.ndarray:
    """Corpus token-id frequency counts (host-side, tokenize-only pass) —
    the input to :func:`sif_weights_from_counts`. ``texts`` may be any
    iterable (a sampling generator for streaming builds)."""
    counts = np.zeros(vocab_size, np.int64)
    for t in texts:
        ids, mask = tokenizer.encode(t, max_len)
        n = int(np.sum(mask))
        np.add.at(counts, np.asarray(ids[:n], np.int64), 1)
    return counts


# ---------------------------------------------------------------------------
# HuggingFace checkpoint loading (when local weights exist)
# ---------------------------------------------------------------------------

_HF_PREFIXES = ("", "bert.", "encoder.", "0.auto_model.")


def load_hf_checkpoint(path: str | Path, config: MiniLMConfig) -> Optional[Params]:
    """Map a local HF BERT/MiniLM checkpoint onto our stacked pytree.

    Accepts a directory containing ``model.safetensors`` or
    ``pytorch_model.bin``. Returns None when nothing usable is found.
    """
    path = Path(path)
    state: Optional[dict[str, np.ndarray]] = None
    if path.is_dir():
        st = path / "model.safetensors"
        pt = path / "pytorch_model.bin"
        if st.exists():
            from safetensors.numpy import load_file  # type: ignore

            state = dict(load_file(str(st)))
        elif pt.exists():
            import torch  # cpu torch is baked in

            raw = torch.load(str(pt), map_location="cpu", weights_only=True)
            state = {k: v.numpy() for k, v in raw.items()}
    if state is None:
        return None

    def get(name: str) -> np.ndarray:
        for pre in _HF_PREFIXES:
            if pre + name in state:
                return state[pre + name]
        raise KeyError(name)

    c = config
    L = c.num_layers

    def stacked(fmt: str, transpose: bool = False) -> jnp.ndarray:
        arrs = []
        for i in range(L):
            a = get(fmt.format(i))
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dtype=jnp.float32)

    A = "encoder.layer.{}.attention.self."
    AO = "encoder.layer.{}.attention.output."
    FF = "encoder.layer.{}."
    return {
        "embeddings": {
            "word": jnp.asarray(get("embeddings.word_embeddings.weight")),
            "position": jnp.asarray(get("embeddings.position_embeddings.weight")),
            "token_type": jnp.asarray(get("embeddings.token_type_embeddings.weight")),
            "ln_scale": jnp.asarray(get("embeddings.LayerNorm.weight")),
            "ln_bias": jnp.asarray(get("embeddings.LayerNorm.bias")),
        },
        "layers": {
            # torch Linear stores [out, in]; our kernels are [in, out]
            "q_kernel": stacked(A + "query.weight", True),
            "q_bias": stacked(A + "query.bias"),
            "k_kernel": stacked(A + "key.weight", True),
            "k_bias": stacked(A + "key.bias"),
            "v_kernel": stacked(A + "value.weight", True),
            "v_bias": stacked(A + "value.bias"),
            "o_kernel": stacked(AO + "dense.weight", True),
            "o_bias": stacked(AO + "dense.bias"),
            "attn_ln_scale": stacked(AO + "LayerNorm.weight"),
            "attn_ln_bias": stacked(AO + "LayerNorm.bias"),
            "wi_kernel": stacked(FF + "intermediate.dense.weight", True),
            "wi_bias": stacked(FF + "intermediate.dense.bias"),
            "wo_kernel": stacked(FF + "output.dense.weight", True),
            "wo_bias": stacked(FF + "output.dense.bias"),
            "mlp_ln_scale": stacked(FF + "output.LayerNorm.weight"),
            "mlp_ln_bias": stacked(FF + "output.LayerNorm.bias"),
        },
    }


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
