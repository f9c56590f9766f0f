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


class TestAdapterCharacterization:
    """Pin the validated capabilities/limits of embedding-space adaptation
    (module docstring): the linear adapter denoises, and off-manifold
    denoising is provably ranking-invariant for cosine retrieval."""

    @pytest.fixture(scope="class")
    def manifold(self):
        rng = np.random.default_rng(0)
        dim, r, n = 128, 40, 2000
        M = rng.normal(size=(r, dim)).astype(np.float32) / np.sqrt(r)
        lat = rng.normal(size=(n, r)).astype(np.float32)
        corpus = (lat @ M) * 100.0
        return rng, M, corpus

    def test_linear_adapter_denoises(self, manifold):
        from pyarrowspace_tpu.models.domain_adapter import DomainAdapter
        rng, M, corpus = manifold
        ad = DomainAdapter(epochs=800, alpha=1.0, hidden=64,
                           learning_rate=1e-3, arch="linear").fit(corpus)
        rec = ad.transform(corpus)
        rel = np.linalg.norm(rec - corpus) / np.linalg.norm(corpus)
        assert rel < 0.1, rel                 # reconstructs the manifold
        noise = rng.normal(size=(200, corpus.shape[1])).astype(
            np.float32) * 100
        keep = np.linalg.norm(ad.transform(noise)) / np.linalg.norm(noise)
        assert keep < 0.75, keep              # strips off-manifold energy

    def test_manifold_projection_is_ranking_invariant(self, manifold):
        """For P with P x_i = x_i: q^T P x_i = q^T x_i, so cosine order is
        untouched — the oracle projection reproduces raw retrieval."""
        rng, M, corpus = manifold
        P = M.T @ np.linalg.inv(M @ M.T) @ M
        queries = (corpus[:50]
                   + 5.0 * np.linalg.norm(corpus[:50], axis=1,
                                          keepdims=True)
                   / np.sqrt(corpus.shape[1])
                   * rng.normal(size=(50, corpus.shape[1]))
                   .astype(np.float32))
        xu = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)

        def ranks(q):
            qq = q / np.linalg.norm(q, axis=1, keepdims=True)
            return np.argsort(-(qq @ xu.T), axis=1, kind="stable")[:, :10]

        raw = ranks(queries)
        proj = ranks(queries @ P)             # corpus unchanged: P xi = xi
        np.testing.assert_array_equal(raw, proj)


class TestTSDAE:
    """Text-level TSDAE (models/tsdae.py) — the reference's
    embeddings_model stage (denoising autoencoder fine-tune of the text
    encoder, reference tests/embeddings_model.py:23-35)."""

    CORPUS = [
        "heap overflow in the image parser allows remote code execution",
        "stack overflow in the pdf parser allows remote code execution",
        "cross site scripting in the admin panel leaks session cookies",
        "sql injection in the login form leaks user credentials",
        "use after free in the font renderer allows remote code execution",
        "improper input validation in the upload handler leaks files",
        "buffer overflow in the audio decoder allows remote code",
        "path traversal in the download endpoint leaks arbitrary files",
    ] * 4

    def _small_config(self, **kw):
        from pyarrowspace_tpu.models import TSDAEConfig
        base = dict(vocab=512, d_model=32, n_layers=1, heads=4,
                    max_len=16, epochs=8, lr=1e-3, batch_size=8, seed=0)
        base.update(kw)
        return TSDAEConfig(**base)

    def test_training_reduces_reconstruction_loss(self):
        from pyarrowspace_tpu.models import TSDAEEncoder
        enc = TSDAEEncoder(self._small_config())
        enc.fit(self.CORPUS)
        first = np.mean(enc.losses_[:4])
        last = np.mean(enc.losses_[-4:])
        assert last < 0.85 * first, (first, last)

    def test_encode_shape_norm_and_determinism(self):
        from pyarrowspace_tpu.models import TSDAEEncoder
        enc = TSDAEEncoder(self._small_config())
        e1 = enc.encode(self.CORPUS[:5])
        e2 = enc.encode(self.CORPUS[:5])
        assert e1.shape == (5, 32)
        np.testing.assert_allclose(np.linalg.norm(e1, axis=1), 1.0,
                                   rtol=1e-5)
        np.testing.assert_array_equal(e1, e2)
        # batch-size independence (padding must not leak into outputs)
        e3 = enc.encode(self.CORPUS[:5], batch_size=2)
        np.testing.assert_allclose(e1, e3, atol=1e-5)

    def test_adapted_embeddings_preserve_lexical_similarity(self):
        from pyarrowspace_tpu.models import TSDAEEncoder
        enc = TSDAEEncoder(self._small_config())
        enc.fit(self.CORPUS)
        emb = enc.encode([
            "heap overflow in the image parser allows remote code",
            "stack overflow in the image parser allows remote code",
            "sql injection in the login form leaks user credentials",
        ])
        sim_near = float(emb[0] @ emb[1])
        sim_far = float(emb[0] @ emb[2])
        assert sim_near > sim_far, (sim_near, sim_far)

    def test_save_load_roundtrip(self, tmp_path):
        from pyarrowspace_tpu.models import TSDAEEncoder
        enc = TSDAEEncoder(self._small_config(epochs=1))
        enc.fit(self.CORPUS[:8])
        p = str(tmp_path / "tsdae.npz")
        enc.save(p)
        from pyarrowspace_tpu.models.tsdae import TSDAEEncoder as T2
        back = T2.load(p)
        np.testing.assert_allclose(enc.encode(self.CORPUS[:3]),
                                   back.encode(self.CORPUS[:3]), atol=1e-6)

    def test_adapt_corpus_end_to_end_build(self):
        """Reference flow: CVE-style texts -> TSDAE adapt -> standard
        build -> search stays self-consistent."""
        from pyarrowspace_tpu.models import adapt_corpus
        from pyarrowspace_tpu import ArrowSpaceBuilder
        emb = adapt_corpus(self.CORPUS[:16], self._small_config(epochs=2))
        gp = {"eps": 1.31, "k": 4, "topk": 5, "p": 2.0, "sigma": None}
        aspace, gl = ArrowSpaceBuilder.build(gp, emb.astype(np.float64))
        hits = aspace.search(emb[0].astype(np.float64), gl, 0.62)
        assert hits[0][0] == 0
