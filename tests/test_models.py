"""Domain-adaptation and text-encoder front-ends (reference
tests/embeddings_model.py equivalent)."""

import numpy as np
import pytest

from pyarrowspace_tpu.models import DomainAdapter, embed_texts, hash_embed


def test_adapter_denoises_toward_manifold():
    """Training on clustered data must pull noisy points toward their
    cluster structure: reconstruction error of held-out noisy samples
    drops after adaptation."""
    rng = np.random.default_rng(0)
    base = rng.normal(size=(20, 64))
    train = np.repeat(base, 50, axis=0) + 0.1 * rng.normal(size=(1000, 64))
    adapter = DomainAdapter(epochs=200, learning_rate=3e-3, alpha=1.0,
                            batch_size=256, seed=0).fit(train)
    held = np.repeat(base, 5, axis=0)
    noisy = held + 0.3 * rng.normal(size=held.shape)
    adapted = adapter.transform(noisy)
    # distance to the true (clean) points shrinks
    before = np.linalg.norm(noisy - held, axis=1).mean()
    after = np.linalg.norm(adapted - held, axis=1).mean()
    assert after < before


def test_adapter_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(200, 32))
    adapter = DomainAdapter(epochs=2, batch_size=64).fit(x)
    p = str(tmp_path / "adapter.npz")
    adapter.save(p)
    back = DomainAdapter.load(p)
    np.testing.assert_allclose(adapter.transform(x[:5]),
                               back.transform(x[:5]), rtol=1e-6)


def test_adapter_transform_before_fit():
    with pytest.raises(ValueError, match="before fit"):
        DomainAdapter().transform(np.zeros((2, 4)))


def test_hash_embed_properties():
    texts = ["the quick brown fox", "the quick brown foxes",
             "completely unrelated text about databases"]
    emb = hash_embed(texts, dim=256)
    assert emb.shape == (3, 256)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-6)
    sim_close = emb[0] @ emb[1]
    sim_far = emb[0] @ emb[2]
    assert sim_close > sim_far  # lexical similarity preserved
    # determinism
    np.testing.assert_array_equal(emb, hash_embed(texts, dim=256))


def test_embed_texts_falls_back_offline():
    emb = embed_texts(["hello world", "goodbye world"],
                      model_name="definitely/not-a-local-model")
    assert emb.shape == (2, 384)
    assert np.all(np.isfinite(emb))
