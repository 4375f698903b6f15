"""Embedding model runtime: tokenizer + MiniLM + jit cache + batching.

Rebuild of the reference's ``EmbeddingModel`` wrapper
(``/root/reference/src/vector.rs:34-38,162-181``) — which was a stub
returning ``vec![0.0; 768]`` — as a real device pipeline:

  text → WordPiece ids (host) → jit'd MiniLM encode (device, bf16) →
  L2-normalised ``[B, D]`` float32 embeddings.

Serving concerns handled here:
  * **Shape bucketing**: inputs pad to the next power-of-two sequence
    length (≥16, ≤ config max) so the jit cache stays small and no query
    pays full-512 cost.
  * **Micro-batch chunking** to ``config.batch_size`` multiples for long
    document streams (index builds).
  * Per-call timing surfaced like the reference's
    ``EmbeddingResult.processing_time_ms`` (vector.rs:169-175).
"""

from __future__ import annotations

import functools
import logging
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EmbeddingModelConfig
from ..core.errors import EmbeddingGenerationFailed
from ..utils import batch_bucket
from . import minilm
from .tokenizer import WordPieceTokenizer, load_tokenizer

_log = logging.getLogger("tss_tpu.embedder")


@dataclass
class EmbeddingResult:
    """ref: vector.rs EmbeddingResult {embedding, processing_time_ms}."""

    embedding: np.ndarray
    processing_time_ms: float


def _bucket_len(n: int, max_len: int) -> int:
    b = 16
    while b < n:
        b *= 2
    return min(b, max_len)


class Embedder:
    """The serving-side embedding model."""

    def __init__(
        self,
        config: Optional[EmbeddingModelConfig] = None,
        tokenizer: Optional[WordPieceTokenizer] = None,
        params: Optional[minilm.Params] = None,
        model_config: Optional[minilm.MiniLMConfig] = None,
        seed: int = 0,
        token_weights: Optional[np.ndarray] = None,
    ):
        self.config = config or EmbeddingModelConfig()
        self.tokenizer = tokenizer or load_tokenizer(self.config.tokenizer_path)
        vocab_size = max(len(self.tokenizer), 128)
        # model_type selects the family geometry (minilm-l6 384-d vs
        # legal-bert 768-d — the reference's two configured options)
        self.model_config = model_config or minilm.config_for_model_type(
            self.config.model_type,
            vocab_size=vocab_size,
            max_position=self.config.max_sequence_length,
        )
        if params is not None:
            self.params = params
        else:
            loaded = None
            mp = Path(self.config.model_path)
            if mp.exists():
                try:
                    loaded = minilm.load_hf_checkpoint(mp, self.model_config)
                except (KeyError, ValueError, ImportError) as e:
                    _log.warning("HF checkpoint load failed (%s); random init", e)
            self.params = (
                loaded
                if loaded is not None
                else minilm.init_params(jax.random.PRNGKey(seed), self.model_config)
            )
        # pin the weights to the device ONCE: checkpoint loaders return
        # host numpy arrays, and a jit call with host-array params ships
        # the whole model through the device link on EVERY encode
        # (measured ~1.9 s per serving batch on the remote-TPU tunnel)
        self.params = jax.device_put(self.params)
        # optional SIF pooling weights ([vocab] f32; minilm.encode) — part
        # of the encoder identity: corpus and query embeddings are only
        # comparable under the SAME pooling, so these persist with the
        # checkpoint (builder.save_encoder / load_build_artifacts)
        self.token_weights = (
            None if token_weights is None
            else jax.device_put(jnp.asarray(token_weights, jnp.float32))
        )
        self._stats = {"texts_embedded": 0, "batches": 0, "total_ms": 0.0}

    @property
    def dimension(self) -> int:
        return self.model_config.hidden_size

    @functools.cached_property
    def _encode_jit(self):
        cfg = self.model_config
        weighted = self.token_weights is not None

        @jax.jit
        def _enc(params, ids, mask, tw):
            return minilm.encode(
                params, ids, mask, cfg,
                token_weights=tw if weighted else None,
            )

        return _enc

    def set_token_weights(self, token_weights: Optional[np.ndarray]) -> None:
        """Switch pooling (None = plain mean) — invalidates the cached jit
        program, which bakes in whether the weight gather exists."""
        self.token_weights = (
            None if token_weights is None
            else jax.device_put(jnp.asarray(token_weights, jnp.float32))
        )
        self.__dict__.pop("_encode_jit", None)

    # -- public API ---------------------------------------------------------

    def embed(self, texts: Sequence[str]) -> EmbeddingResult:
        """Embed a batch of texts → ``[B, D]`` f32 (L2-normalised)."""
        if not texts:
            return EmbeddingResult(
                np.zeros((0, self.dimension), np.float32), 0.0
            )
        t0 = time.perf_counter()
        try:
            out = np.concatenate(
                [self._embed_chunk(list(chunk)) for chunk in _chunks(texts, 256)]
            )
        except Exception as e:  # surface with the reference's error shape
            raise EmbeddingGenerationFailed(
                text_preview=str(texts[0])[:60], reason=str(e)
            ) from e
        ms = (time.perf_counter() - t0) * 1000
        self._stats["texts_embedded"] += len(texts)
        self._stats["batches"] += 1
        self._stats["total_ms"] += ms
        return EmbeddingResult(out, ms)

    def embed_one(self, text: str) -> np.ndarray:
        return self.embed([text]).embedding[0]

    def _embed_chunk(self, texts: list[str]) -> np.ndarray:
        # Tokenise, then pad batch to a (batch, seq) shape bucket.
        enc = [self.tokenizer.encode(t, self.config.max_sequence_length) for t in texts]
        true_len = max(max(sum(m) for _, m in enc), 2)
        L = _bucket_len(true_len, self.config.max_sequence_length)
        B = len(texts)
        # the SHARED serving ladder (utils.BATCH_BUCKETS) — a private
        # embedder ladder is an unwarmed jit shape at serve time (a
        # 9..16-query batch padding to 16 cost a 14 s remote compile and
        # a 64-request 504 wave in the round-5 c=64 loadtest)
        Bpad = batch_bucket(B)
        ids = np.zeros((Bpad, L), np.int32)
        mask = np.zeros((Bpad, L), np.int32)
        for i, (a, m) in enumerate(enc):
            ids[i] = a[:L]
            mask[i] = m[:L]
        tw = self.token_weights
        if tw is None:  # static-shape placeholder; traced out when unused
            tw = jnp.zeros((1,), jnp.float32)
        emb = self._encode_jit(
            self.params, jnp.asarray(ids), jnp.asarray(mask), tw
        )
        return np.asarray(emb[:B])

    def get_stats(self) -> dict:
        s = dict(self._stats)
        if s["batches"]:
            s["avg_batch_ms"] = s["total_ms"] / s["batches"]
        return s


def _chunks(seq: Sequence[str], n: int):
    for i in range(0, len(seq), n):
        yield seq[i : i + n]
