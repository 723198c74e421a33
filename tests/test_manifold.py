import numpy as np
import jax.numpy as jnp
from sklearn.neighbors import KDTree

from livespeechportraits_tpu.ops import manifold


def test_knn_matches_sklearn():
    rng = np.random.default_rng(0)
    bank = rng.normal(size=(500, 32)).astype(np.float32)
    q = rng.normal(size=(20, 32)).astype(np.float32)
    ours = np.asarray(manifold.knn_indices(jnp.asarray(q), jnp.asarray(bank), K=10))
    _, ref = KDTree(bank).query(q, k=10)
    # sets must agree (ordering may differ on near-ties)
    for t in range(q.shape[0]):
        assert set(ours[t].tolist()) == set(ref[t].tolist())


def test_knn_chunked_equals_dense():
    rng = np.random.default_rng(1)
    bank = rng.normal(size=(1000, 16)).astype(np.float32)
    q = rng.normal(size=(13, 16)).astype(np.float32)
    dense = np.asarray(manifold.knn_indices(jnp.asarray(q), jnp.asarray(bank), K=7))
    chunked = np.asarray(manifold.knn_chunked(jnp.asarray(q), jnp.asarray(bank), K=7, chunk=256))
    for t in range(q.shape[0]):
        assert set(dense[t].tolist()) == set(chunked[t].tolist())


def test_lle_weights_sum_to_one_and_match_numpy_oracle():
    """Per-frame oracle: the constrained least-squares solve of
    funcs/utils.py:121-157 (reduced system, w0 = 1 - sum(rest))."""
    rng = np.random.default_rng(2)
    T, K, D = 9, 10, 24
    neighbors = rng.normal(size=(T, K, D)).astype(np.float32)
    feats = rng.normal(size=(T, D)).astype(np.float32)

    w, recon = manifold.solve_lle_weights(jnp.asarray(feats), jnp.asarray(neighbors))
    w, recon = np.asarray(w), np.asarray(recon)
    np.testing.assert_allclose(w.sum(axis=1), np.ones(T), atol=1e-4)

    for t in range(T):
        B = feats[t] - neighbors[t, 0]
        A = (neighbors[t, 1:] - neighbors[t, 0]).T  # [D, K-1]
        w_rest = np.linalg.solve(A.T @ A, A.T @ B)
        ref_w = np.concatenate([[1 - w_rest.sum()], w_rest])
        np.testing.assert_allclose(w[t], ref_w, rtol=2e-2, atol=2e-3)
        np.testing.assert_allclose(recon[t], ref_w @ neighbors[t], rtol=2e-2, atol=2e-3)


def test_lle_exact_reconstruction_in_span():
    """A query that is an affine combination of its neighbours is
    reconstructed exactly."""
    rng = np.random.default_rng(3)
    K, D = 5, 8
    neighbors = rng.normal(size=(1, K, D)).astype(np.float32)
    true_w = np.array([0.1, 0.4, 0.2, 0.2, 0.1], np.float32)
    feats = (true_w @ neighbors[0])[None]
    w, recon = manifold.solve_lle_weights(jnp.asarray(feats), jnp.asarray(neighbors))
    np.testing.assert_allclose(np.asarray(recon), feats, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w)[0], true_w, atol=1e-4)


def test_lle_project_blend():
    rng = np.random.default_rng(4)
    bank = rng.normal(size=(300, 16)).astype(np.float32)
    q = rng.normal(size=(7, 16)).astype(np.float32)
    full = np.asarray(manifold.lle_project(jnp.asarray(q), jnp.asarray(bank), K=10, percent=1.0))
    none = np.asarray(manifold.lle_project(jnp.asarray(q), jnp.asarray(bank), K=10, percent=0.0))
    half = np.asarray(manifold.lle_project(jnp.asarray(q), jnp.asarray(bank), K=10, percent=0.5))
    np.testing.assert_allclose(none, q, atol=1e-6)
    np.testing.assert_allclose(half, 0.5 * (full + q), atol=1e-5)
    # a bank vector projects to (nearly) itself
    self_q = bank[:3]
    proj = np.asarray(manifold.lle_project(jnp.asarray(self_q), jnp.asarray(bank), K=10, percent=1.0))
    np.testing.assert_allclose(proj, self_q, atol=1e-3)


def test_knn_chunked_clamps_k_to_bank_size():
    """Banks smaller than K must degrade exactly like knn_indices (without
    the clamp, -inf sentinel columns survive as duplicated index-0
    neighbors and feed LLE a singular Gram)."""
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    bank = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    a = manifold.knn_indices(feats, bank, K=7)
    b = manifold.knn_chunked(feats, bank, K=7, chunk=4)
    assert a.shape == b.shape == (6, 5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lle_weights_degenerate_neighbors_stay_finite():
    """Duplicate neighbor rows make the Gram exactly singular; the solve
    must degrade to finite (uniform) weights instead of NaN landmarks."""
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    row = rng.normal(size=(4,)).astype(np.float32)
    neighbors = jnp.asarray(np.broadcast_to(row, (3, 5, 4)).copy())
    w, recon = manifold.solve_lle_weights(feats, neighbors)
    assert np.isfinite(np.asarray(w)).all()
    assert np.isfinite(np.asarray(recon)).all()
    np.testing.assert_allclose(np.asarray(w), 0.2, atol=1e-6)
