"""Domain adaptation of embeddings — TPU-native TSDAE equivalent.

The reference fine-tunes its sentence encoder on the target corpus with a
denoising autoencoder objective before building the index (reference
tests/embeddings_model.py: TSDAE / DenoisingAutoEncoderLoss, 1 epoch,
lr 3e-5; the adapted model feeds tests 2/8/9).  Rebuilding a torch text
encoder is out of scope for a TPU similarity engine, so this module adapts
the *embedding space* instead: a denoising autoencoder (tied LINEAR by
default — converges to the principal-subspace projection — or a gelu MLP)
is trained on the corpus embeddings with input corruption, and
decode(encode(.)) becomes the domain projection applied to corpus and
queries alike.  Defaults mirror the reference's recipe (1 epoch, lr 3e-5,
seed 42).  All training is jitted JAX (optax AdamW).

Validated characterization (tests/test_models.py) — what embedding-space
adaptation CAN and CANNOT do:

* It denoises: on a rank-r manifold corpus the linear adapter reaches
  ~3% reconstruction error while passing only ~sqrt(hidden/F) of
  isotropic off-manifold noise.
* It CANNOT change cosine rankings through its linear/projective part
  when the corpus lies on the learned manifold: for a projection P with
  P x_i = x_i, q^T P x_i = q^T x_i — the numerator of every cosine is
  unchanged and the per-query norm rescale is rank-invariant.  Measured:
  the ORACLE (exact manifold) projection reproduces raw retrieval
  metrics exactly.  The reference's TSDAE gains therefore live in the
  nonlinear text ENCODER it fine-tunes — unreachable from embeddings
  alone — which is the documented fidelity boundary of this deviation
  (SURVEY.md §2.3, VERDICT round-1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.debug import dbg_println, phase
from ..utils.logging import get_logger

log = get_logger("models")


def _init_params(rng: jax.Array, dim: int, hidden: int, dtype,
                 arch: str) -> dict:
    k1, k2 = jax.random.split(rng)
    scale_in = 1.0 / np.sqrt(dim)
    if arch == "linear":
        # Tied linear autoencoder: under MSE it converges to the top-hidden
        # principal subspace, so decode(encode(x)) is (approximately) the
        # PCA projection of x — a provable off-manifold noise stripper.
        return {"w_enc": jax.random.normal(k1, (dim, hidden),
                                           dtype) * scale_in}
    scale_h = 1.0 / np.sqrt(hidden)
    return {
        "w_enc": jax.random.normal(k1, (dim, hidden), dtype) * scale_in,
        "b_enc": jnp.zeros((hidden,), dtype),
        "w_dec": jax.random.normal(k2, (hidden, dim), dtype) * scale_h,
        "b_dec": jnp.zeros((dim,), dtype),
    }


def _encode(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = jnp.matmul(x, params["w_enc"], preferred_element_type=x.dtype)
    if "b_enc" not in params:     # linear tied
        return h
    return jax.nn.gelu(h + params["b_enc"])


def _decode(params: dict, h: jnp.ndarray) -> jnp.ndarray:
    if "b_dec" not in params:     # linear tied: decoder = encoder^T
        return jnp.matmul(h, params["w_enc"].T,
                          preferred_element_type=h.dtype)
    return jnp.matmul(h, params["w_dec"],
                      preferred_element_type=h.dtype) + params["b_dec"]


@dataclasses.dataclass
class DomainAdapter:
    """Denoising-autoencoder embedding adapter.

    fit() trains on [N, F] embeddings; transform() maps embeddings into the
    adapted space: x_adapted = concat-free residual blend
    x + alpha * (decode(encode(x)) - x), which preserves scale/geometry at
    alpha=0 and moves toward the denoised manifold as alpha grows.
    """

    hidden: Optional[int] = None      # default: F // 2, min 32
    noise_std: float = 0.2            # corruption strength (TSDAE analogue)
    learning_rate: float = 3e-5       # reference recipe (embeddings_model.py)
    epochs: int = 1                   # reference recipe
    batch_size: int = 1024
    alpha: float = 0.5                # residual blend at transform time
    arch: str = "linear"              # "linear" (tied, ~PCA) | "mlp" (gelu)
    seed: int = 42
    params: Optional[dict] = None

    def fit(self, embeddings) -> "DomainAdapter":
        x = jnp.asarray(embeddings)
        n, f = x.shape
        hidden = self.hidden or max(32, f // 2)
        rng = jax.random.PRNGKey(self.seed)
        params = _init_params(rng, f, hidden, x.dtype, self.arch)
        tx = optax.adamw(self.learning_rate)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, batch, key):
            def loss_fn(p):
                noisy = batch + self.noise_std * jax.random.normal(
                    key, batch.shape, batch.dtype) * jnp.std(batch)
                recon = _decode(p, _encode(p, noisy))
                return jnp.mean((recon - batch) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        bs = min(self.batch_size, n)
        n_batches = max(1, n // bs)
        with phase("domain_adapter_fit"):
            order = np.random.default_rng(self.seed).permutation(n)
            x_shuf = x[jnp.asarray(order)]
            loss = jnp.inf
            for epoch in range(self.epochs):
                for b in range(n_batches):
                    batch = jax.lax.dynamic_slice(
                        x_shuf, (b * bs, 0), (bs, f))
                    rng, key = jax.random.split(rng)
                    params, opt_state, loss = step(params, opt_state,
                                                   batch, key)
                dbg_println(f"domain_adapter epoch {epoch}: "
                            f"loss={float(loss):.6f}")
                log.debug("epoch %d loss %.6f", epoch, float(loss))
        self.params = jax.tree.map(np.asarray, params)
        return self

    def transform(self, embeddings) -> np.ndarray:
        if self.params is None:
            raise ValueError("DomainAdapter.transform before fit")
        x = jnp.asarray(embeddings)
        p = jax.tree.map(jnp.asarray, self.params)
        recon = _decode(p, _encode(p, x))
        out = x + self.alpha * (recon - x)
        return np.asarray(out)

    def save(self, path: str) -> None:
        if self.params is None:
            raise ValueError("DomainAdapter.save before fit")
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 **{k: np.asarray(v) for k, v in self.params.items()},
                 _meta=np.asarray([self.alpha, self.noise_std]))

    @classmethod
    def load(cls, path: str) -> "DomainAdapter":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        meta = z["_meta"]
        adapter = cls(alpha=float(meta[0]), noise_std=float(meta[1]))
        adapter.params = {k: z[k] for k in
                          ("w_enc", "b_enc", "w_dec", "b_dec") if k in z}
        adapter.arch = "linear" if "b_enc" not in adapter.params else "mlp"
        return adapter
