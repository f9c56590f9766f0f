"""TSDAE domain adaptation of a TEXT encoder — the reference's
embeddings_model stage, TPU-native.

The reference fine-tunes a pretrained sentence encoder on the target
corpus with a denoising autoencoder objective before building the index
(reference tests/embeddings_model.py:23-35: sentence-transformers
`DenoisingAutoEncoderDataset` + `DenoisingAutoEncoderLoss` with
tie_encoder_decoder=True, 1 epoch, lr 3e-5, weight_decay 0, batch 8).
This module implements the same training objective on a from-scratch JAX
mini-transformer:

* noise: per-token deletion at ratio 0.6 (the sentence-transformers
  dataset default) applied host-side;
* encoder: token-hash embedding + learned positions + pre-LN transformer
  blocks, mean-pooled over non-pad positions into ONE sentence vector;
* decoder: causal transformer over the ORIGINAL token sequence whose
  cross-attention memory is exactly that single sentence vector (the
  TSDAE bottleneck — the decoder can only reconstruct through the
  embedding), token table and output logits tied to the encoder's;
* loss: token cross-entropy of the clean text given the noisy encoding.

Fidelity boundary (documented, SURVEY.md §2.3): the reference adapts a
PRETRAINED MiniLM; no pretrained weights exist in this zero-egress
environment, so this encoder trains from scratch — the component parity
is the training objective, recipe, and text->embedding surface, not
MiniLM's absolute quality.  For embedding-space-only adaptation (when
corpora arrive as vectors, not text) see models/domain_adapter.py.

Everything under `fit` is a single jitted train step (static shapes:
fixed max_len, fixed batch with padding) — no data-dependent Python in
the hot path.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .encoders import _TOKEN_RE
from ..utils.debug import dbg_println, phase
from ..utils.logging import get_logger

log = get_logger("models")

_PAD, _BOS = 0, 1
_SPECIALS = 2


def _token_ids(text: str, vocab: int, seed: int) -> list[int]:
    """Word-level hashing tokenizer (same token regex + blake2b hashing
    family as models.encoders.hash_embed, so vocabularies are stable
    across runs and processes)."""
    ids = []
    for tok in _TOKEN_RE.findall(text.lower()):
        h = hashlib.blake2b(f"{seed}:{tok}".encode(), digest_size=8)
        v = int.from_bytes(h.digest(), "little")
        ids.append(_SPECIALS + v % (vocab - _SPECIALS))
    return ids


def _encode_batch(texts: Sequence[str], vocab: int, max_len: int,
                  seed: int) -> np.ndarray:
    out = np.zeros((len(texts), max_len), dtype=np.int32)
    for i, t in enumerate(texts):
        ids = _token_ids(t, vocab, seed)[:max_len]
        out[i, : len(ids)] = ids
    return out


def _delete_noise(ids: np.ndarray, ratio: float,
                  rng: np.random.Generator) -> np.ndarray:
    """Token-deletion noise (DenoisingAutoEncoderDataset default policy:
    delete each token with prob `ratio`, keep at least one)."""
    noisy = np.zeros_like(ids)
    for i in range(ids.shape[0]):
        toks = ids[i][ids[i] != _PAD]
        if len(toks) == 0:
            continue
        keep = rng.random(len(toks)) >= ratio
        if not keep.any():
            keep[rng.integers(len(toks))] = True
        kept = toks[keep]
        noisy[i, : len(kept)] = kept
    return noisy


def _init_block(k, d, cross: bool) -> dict:
    names = ["wq", "wk", "wv", "wo"] + (["cq", "ck", "cv", "co"]
                                        if cross else [])
    ks = jax.random.split(k, len(names) + 2)
    p = {n: jax.random.normal(ks[i], (d, d)) * 0.02
         for i, n in enumerate(names)}
    p["w1"] = jax.random.normal(ks[-2], (d, 4 * d)) * 0.02
    p["w2"] = jax.random.normal(ks[-1], (4 * d, d)) * 0.02
    for ln in (["ln1", "ln2"] + (["ln3"] if cross else [])):
        p[ln + "_s"] = jnp.ones((d,))
        p[ln + "_b"] = jnp.zeros((d,))
    return p


def _init_params(rng, vocab: int, d: int, max_len: int,
                 n_layers: int) -> dict:
    ks = jax.random.split(rng, 2 * n_layers + 2)
    return {
        "tok": jax.random.normal(ks[0], (vocab, d)) * 0.02,  # tied logits
        "pos": jax.random.normal(ks[1], (max_len, d)) * 0.02,
        "enc": [_init_block(ks[2 + i], d, cross=False)
                for i in range(n_layers)],
        "dec": [_init_block(ks[2 + n_layers + i], d, cross=True)
                for i in range(n_layers)],
        "lnf_s": jnp.ones((d,)), "lnf_b": jnp.zeros((d,)),
    }


def _ln(x, s, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * s + b


def _mha(xq, xkv, wq, wk, wv, wo, heads: int, mask=None):
    b, lq, d = xq.shape
    lk = xkv.shape[1]
    hd = d // heads
    q = (xq @ wq).reshape(b, lq, heads, hd)
    k = (xkv @ wk).reshape(b, lk, heads, hd)
    v = (xkv @ wv).reshape(b, lk, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e9)
    att = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, lq, d)
    return out @ wo


def _block(x, p, heads, mask=None, memory=None):
    h = _ln(x, p["ln1_s"], p["ln1_b"])
    x = x + _mha(h, h, p["wq"], p["wk"], p["wv"], p["wo"], heads, mask)
    if memory is not None:  # cross-attention to the sentence vector
        h = _ln(x, p["ln3_s"], p["ln3_b"])
        x = x + _mha(h, memory, p["cq"], p["ck"], p["cv"], p["co"], heads)
    h = _ln(x, p["ln2_s"], p["ln2_b"])
    return x + jax.nn.gelu(h @ p["w1"]) @ p["w2"]


def _encoder(params, ids, heads):
    """ids [B, L] -> mean-pooled sentence embeddings [B, D]."""
    np_mask = ids != _PAD                                  # [B, L]
    x = params["tok"][ids] + params["pos"][None, : ids.shape[1]]
    att = np_mask[:, None, None, :]                        # keys only
    for p in params["enc"]:
        x = _block(x, p, heads, mask=att)
    x = _ln(x, params["lnf_s"], params["lnf_b"])
    w = np_mask[:, :, None].astype(x.dtype)
    return jnp.sum(x * w, axis=1) / jnp.maximum(
        jnp.sum(w, axis=1), 1.0)


def _decoder_logits(params, emb, tgt_ids, heads):
    """Causal LM over the clean tokens, conditioned ONLY on the sentence
    embedding (cross-attention memory of length 1)."""
    b, length = tgt_ids.shape
    dec_in = jnp.concatenate(
        [jnp.full((b, 1), _BOS, tgt_ids.dtype), tgt_ids[:, :-1]], axis=1)
    x = params["tok"][dec_in] + params["pos"][None, :length]
    causal = jnp.tril(jnp.ones((length, length), bool))[None, None]
    mem = emb[:, None, :]
    for p in params["dec"]:
        x = _block(x, p, heads, mask=causal, memory=mem)
    x = _ln(x, params["lnf_s"], params["lnf_b"])
    return x @ params["tok"].T                             # tied logits


@dataclasses.dataclass
class TSDAEConfig:
    vocab: int = 8192
    d_model: int = 384          # MiniLM's output width (test_2 shape)
    n_layers: int = 2
    heads: int = 6
    max_len: int = 128
    noise_ratio: float = 0.6    # DenoisingAutoEncoderDataset default
    batch_size: int = 8         # reference recipe
    epochs: int = 1
    lr: float = 3e-5
    weight_decay: float = 0.0
    seed: int = 42


class TSDAEEncoder:
    """Text encoder adapted to a corpus with the TSDAE objective.

    Mirrors the reference flow (embeddings_model.py): fit on the raw
    corpus texts, then `encode` produces the domain-adapted embeddings
    that feed the standard build.
    """

    def __init__(self, config: Optional[TSDAEConfig] = None):
        self.config = config or TSDAEConfig()
        c = self.config
        if c.d_model % c.heads:
            raise ValueError("d_model must divide heads")
        self.params = _init_params(jax.random.PRNGKey(c.seed), c.vocab,
                                   c.d_model, c.max_len, c.n_layers)
        self.losses_: list[float] = []

    def fit(self, texts: Sequence[str]) -> "TSDAEEncoder":
        c = self.config
        ids = _encode_batch(texts, c.vocab, c.max_len, c.seed)
        rng = np.random.default_rng(c.seed)
        tx = optax.adamw(c.lr, weight_decay=c.weight_decay)
        opt_state = tx.init(self.params)
        heads = c.heads

        @jax.jit
        def step(params, opt_state, noisy, clean):
            def loss_fn(p):
                emb = _encoder(p, noisy, heads)
                logits = _decoder_logits(p, emb, clean, heads)
                mask = (clean != _PAD).astype(jnp.float32)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, clean)
                return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        n = ids.shape[0]
        with phase("tsdae_fit"):
            for epoch in range(c.epochs):
                order = rng.permutation(n)
                for s in range(0, n, c.batch_size):
                    sel = order[s: s + c.batch_size]
                    if len(sel) < c.batch_size:  # static batch shape
                        sel = np.concatenate(
                            [sel, order[: c.batch_size - len(sel)]])
                    clean = ids[sel]
                    noisy = _delete_noise(clean, c.noise_ratio, rng)
                    self.params, opt_state, loss = step(
                        self.params, opt_state, jnp.asarray(noisy),
                        jnp.asarray(clean))
                    self.losses_.append(float(loss))
                dbg_println(f"tsdae epoch {epoch}: "
                            f"loss {self.losses_[-1]:.4f}")
        return self

    def encode(self, texts: Sequence[str], batch_size: int = 256,
               normalize: bool = True) -> np.ndarray:
        """texts -> [N, d_model] adapted embeddings (the reference's
        `model.encode(corpus)` surface)."""
        c = self.config
        heads = c.heads
        enc = jax.jit(lambda p, i: _encoder(p, i, heads))
        outs = []
        for s in range(0, len(texts), batch_size):
            chunk = list(texts[s: s + batch_size])
            ids = _encode_batch(chunk, c.vocab, c.max_len, c.seed)
            pad = batch_size - len(chunk)
            if pad:  # static batch shape for the jitted encoder
                ids = np.pad(ids, ((0, pad), (0, 0)))
            outs.append(np.asarray(enc(self.params,
                                       jnp.asarray(ids)))[: len(chunk)])
        emb = np.concatenate(outs, axis=0).astype(np.float32)
        if normalize:
            emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                              1e-12)
        return emb

    def save(self, path: str) -> None:
        flat = {f"p{i}": np.asarray(x) for i, x in
                enumerate(jax.tree.leaves(self.params))}
        np.savez(path, _config=np.array(
            [self.config.vocab, self.config.d_model, self.config.n_layers,
             self.config.heads, self.config.max_len, self.config.seed],
            dtype=np.int64), **flat)

    @classmethod
    def load(cls, path: str) -> "TSDAEEncoder":
        z = np.load(path)
        v, d, nl, h, ml, seed = (int(x) for x in z["_config"])
        enc = cls(TSDAEConfig(vocab=v, d_model=d, n_layers=nl, heads=h,
                              max_len=ml, seed=seed))
        leaves = [jnp.asarray(z[f"p{i}"])
                  for i in range(len(jax.tree.leaves(enc.params)))]
        enc.params = jax.tree.unflatten(
            jax.tree.structure(enc.params), leaves)
        return enc


def adapt_corpus(texts: Sequence[str],
                 config: Optional[TSDAEConfig] = None) -> np.ndarray:
    """One-call reference flow: TSDAE-fit on the corpus, encode it
    (embeddings_model.py:26-43 fit + `model.encode(corpus)`)."""
    enc = TSDAEEncoder(config)
    enc.fit(texts)
    return enc.encode(texts)
