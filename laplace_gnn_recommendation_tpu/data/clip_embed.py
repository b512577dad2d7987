"""CLIP embedding PRODUCTION: articles → 512-d image/text vectors.

TPU-native counterpart of the reference's Colab notebooks (SURVEY §2a "CLIP
embedding notebooks": ``notebooks/kaggle_fashion_clip.ipynb``, "benchmark,
gpu: 2h"), which produce the ViT-B/32 embeddings that
``run_preprocessing_fashion.py:129-162`` consumes. Instead of a notebook, the
producer is an in-framework jitted JAX pipeline:

* both CLIP towers run as FlaxCLIPModel feature calls, jitted once per
  (tower, batch-shape) in bf16 so the transformer matmuls land on the MXU;
* inputs are padded to a fixed batch so ONE compiled program serves the
  whole sweep (no shape churn);
* outputs are L2-normalised float32 and written as the exact npz artifact
  ``preprocess_fashion.load_graph_artifacts`` loads:
  ``{str(raw_article_id): float32[proj_dim]}``.

Pretrained ViT-B/32 weights require network/disk access, which the
zero-egress runner does not have — pass ``weights=`` a local HuggingFace
checkout directory to use them (and its real tokenizer). Without weights the
model is config-initialised and text falls back to a deterministic hashing
tokenizer, so the full produce→consume path (and its throughput) stays
testable offline; the artifact format and compute path are identical either
way.
"""
from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import numpy as np

# CLIP's BPE vocab pins these two ids; the hashing fallback reuses them so
# config-initialised runs see well-formed (bos, tokens…, eos, pad) rows.
_BOS, _EOS = 49406, 49407
_MAX_LEN = 77
# ViT-B/32 pixel normalisation (OpenAI CLIP preprocessing constants).
_PIXEL_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_PIXEL_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def hash_tokenize(
    texts: Sequence[str],
    vocab_size: int,
    max_len: int = _MAX_LEN,
    bos: Optional[int] = None,
    eos: Optional[int] = None,
) -> np.ndarray:
    """Deterministic offline tokenizer fallback: lowercased whitespace words
    hashed (FNV-1a) into the vocab range, framed with CLIP's bos/eos ids.
    NOT a BPE replacement — only for weight-free (config-init) runs where
    token identity is arbitrary anyway. ``eos`` MUST match the model
    config's ``eos_token_id``: the CLIP text tower pools the hidden state at
    the first position whose id equals it."""
    bos = min(_BOS, vocab_size - 2) if bos is None else bos
    eos = min(_EOS, vocab_size - 1) if eos is None else eos
    out = np.full((len(texts), max_len), eos, np.int32)  # CLIP pads with eos
    for r, t in enumerate(texts):
        ids = [bos]
        for w in t.lower().split()[: max_len - 2]:
            h = 2166136261
            for b in w.encode("utf-8"):
                h = ((h ^ b) * 16777619) & 0xFFFFFFFF
            ids.append(h % max(1, vocab_size - 2))
        ids.append(eos)
        out[r, : len(ids)] = np.asarray(ids, np.int32)
    return out


class ClipEmbedder:
    """Batched, jitted CLIP feature extractor for both towers.

    Parameters
    ----------
    weights: optional local HF checkout dir (env-gated; needs the real
        tokenizer + pretrained params). ``None`` → config-initialised.
    config: optional ``transformers.CLIPConfig`` (tiny configs keep tests
        cheap). Ignored when ``weights`` is given.
    batch_size: fixed device batch; final partial batches are padded so the
        compiled program is reused.
    """

    def __init__(
        self,
        weights: Optional[str] = None,
        config=None,
        batch_size: int = 256,
        compute_dtype=None,
        tokenizer: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
    ):
        import jax
        import jax.numpy as jnp
        from transformers import CLIPConfig, FlaxCLIPModel

        self.batch_size = int(batch_size)
        dtype = compute_dtype or jnp.bfloat16
        if weights is not None:
            self.model = FlaxCLIPModel.from_pretrained(
                weights, local_files_only=True, dtype=dtype
            )
            if tokenizer is None:
                from transformers import CLIPTokenizerFast

                tok = CLIPTokenizerFast.from_pretrained(
                    weights, local_files_only=True
                )

                def tokenizer(texts):
                    enc = tok(
                        list(texts), padding="max_length", truncation=True,
                        max_length=_MAX_LEN, return_tensors="np",
                    )
                    return enc["input_ids"].astype(np.int32)

        else:
            cfg = config or CLIPConfig()
            self.model = FlaxCLIPModel(cfg, dtype=dtype)
        self.config = self.model.config
        self.image_size = int(self.config.vision_config.image_size)
        self.proj_dim = int(self.config.projection_dim)
        tc = self.config.text_config
        self._tokenize = tokenizer or (
            lambda texts: hash_tokenize(
                texts, int(tc.vocab_size),
                bos=int(tc.bos_token_id), eos=int(tc.eos_token_id),
            )
        )

        params = self.model.params

        eos_id = int(tc.eos_token_id)

        def text_feats(ids):
            # attention mask: everything up to and including the FIRST eos
            # (from the model config's eos_token_id, NOT inferred from the
            # last column — a custom tokenizer padding with a distinct pad
            # id would otherwise cut every mask at the first pad). Custom
            # tokenizers must still frame sequences with this eos id: the
            # CLIP text tower pools the hidden state at the eos position.
            if eos_id == 2:
                # released OpenAI CLIP checkpoints carry a historically
                # WRONG eos_token_id=2 in their config while the tokenizer
                # emits 49407; HF's modeling_clip special-cases exactly
                # this and falls back to argmax (49407 is the largest
                # vocab id, so argmax finds the true eos position)
                eos = jnp.argmax(ids, axis=1)
            else:
                eos = jnp.argmax((ids == eos_id).astype(jnp.int32), axis=1)
            mask = (
                jnp.arange(ids.shape[1])[None, :] <= eos[:, None]
            ).astype(jnp.int32)
            f = self.model.get_text_features(
                input_ids=ids, attention_mask=mask, params=params
            )
            f = f.astype(jnp.float32)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

        def image_feats(pixels):
            f = self.model.get_image_features(
                pixel_values=pixels.astype(dtype), params=params
            )
            f = f.astype(jnp.float32)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

        self._text_fn = jax.jit(text_feats)
        self._image_fn = jax.jit(image_feats)

    # ------------------------------------------------------------------ text
    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """``[N, proj_dim]`` float32, unit-norm."""
        ids = self._tokenize(list(texts))
        return self._run_batched(self._text_fn, ids)

    # ----------------------------------------------------------------- image
    def preprocess_images(self, images: np.ndarray) -> np.ndarray:
        """uint8/float ``[N, H, W, 3]`` → CLIP-normalised ``[N, 3, S, S]``.
        H/W must already equal the model's image_size (resizing is a host
        concern; PIL is not assumed present)."""
        x = np.asarray(images)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        s = self.image_size
        assert x.shape[1:] == (s, s, 3), (x.shape, s)
        x = (x - _PIXEL_MEAN) / _PIXEL_STD
        return np.transpose(x, (0, 3, 1, 2)).astype(np.float32)

    def embed_images(self, images: np.ndarray) -> np.ndarray:
        """``[N, H, W, 3]`` (uint8 or [0,1] float) → ``[N, proj_dim]``."""
        return self._run_batched(
            self._image_fn, self.preprocess_images(images)
        )

    def _run_batched(self, fn, arr: np.ndarray) -> np.ndarray:
        n, b = len(arr), self.batch_size
        outs = []
        for lo in range(0, n, b):
            chunk = arr[lo : lo + b]
            if len(chunk) < b:  # pad so the compiled program is reused
                pad = np.repeat(chunk[-1:], b - len(chunk), axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            outs.append(np.asarray(fn(chunk))[: min(b, n - lo)])
        return np.concatenate(outs, axis=0) if outs else np.zeros(
            (0, self.proj_dim), np.float32
        )


def write_embeddings_npz(
    path: str, raw_article_ids: Sequence, vectors: np.ndarray
) -> None:
    """Write the artifact ``preprocess_fashion`` consumes:
    ``{str(raw_id): float32[proj_dim]}`` (reference notebook output format,
    loaded at ``preprocess_fashion.py:141-158``)."""
    assert len(raw_article_ids) == len(vectors)
    np.savez(
        path,
        **{str(r): vectors[i].astype(np.float32)
           for i, r in enumerate(raw_article_ids)},
    )


def produce_article_embeddings(
    raw_dir: str,
    raw_article_ids: Sequence,
    texts: Optional[List[str]] = None,
    images: Optional[np.ndarray] = None,
    embedder: Optional[ClipEmbedder] = None,
    **embedder_kw,
) -> ClipEmbedder:
    """End-to-end producer: embeds whatever modalities are given and writes
    ``text_embeddings.npz`` / ``image_embeddings.npz`` into ``raw_dir`` for
    ``preprocess_fashion`` (``config.load_{image,text}_embedding``)."""
    emb = embedder or ClipEmbedder(**embedder_kw)
    if texts is not None:
        write_embeddings_npz(
            os.path.join(raw_dir, "text_embeddings.npz"),
            raw_article_ids, emb.embed_texts(texts),
        )
    if images is not None:
        write_embeddings_npz(
            os.path.join(raw_dir, "image_embeddings.npz"),
            raw_article_ids, emb.embed_images(images),
        )
    return emb
