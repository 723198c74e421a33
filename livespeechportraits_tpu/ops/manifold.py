"""Manifold projection: KNN + locally-linear-embedding reconstruction.

Capability parity with funcs/utils.py:87-179 and the blend at demo.py:200.
Re-designed for TPU:

* KNN: one dense distance matrix (a single [T, D] x [D, N] matmul on the
  MXU, like the reference's cuBLAS path at utils.py:100-116) followed by
  jax.lax.top_k.  For feature banks too large for one HBM-friendly
  materialised [T, N] matrix, `knn_chunked` streams the bank in chunks and
  keeps a running top-k - same results, bounded memory.
* LLE weights: the reference loops frames in Python and calls
  numpy.linalg.solve per frame (utils.py:171-179).  Here all T constrained
  least-squares systems are solved in one batched Cholesky solve
  ([T, K-1, K-1] Gram matrices), one jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("K",))
def knn_indices(feats: jnp.ndarray, feat_database: jnp.ndarray, K: int = 10) -> jnp.ndarray:
    """Indices of the K nearest database rows for each query row.

    Equivalent to utils.py:100-116 (squared-L2 via the |a|^2+|b|^2-2ab
    expansion; ties broken by index like torch.topk on the negated
    distance).

    Args:
        feats: [T, D] queries.  feat_database: [N, D] bank.
    Returns:
        [T, K] int32 indices.
    """
    K = min(K, feat_database.shape[0])  # banks smaller than K degrade gracefully
    q_norm = jnp.sum(feats**2, axis=-1, keepdims=True)  # [T, 1]
    b_norm = jnp.sum(feat_database**2, axis=-1)  # [N]
    dist = q_norm + b_norm[None, :] - 2.0 * jnp.matmul(feats, feat_database.T, precision=jax.lax.Precision.HIGHEST)
    _, idx = jax.lax.top_k(-dist, K)
    return idx


@functools.partial(jax.jit, static_argnames=("K", "chunk"))
def knn_chunked(
    feats: jnp.ndarray, feat_database: jnp.ndarray, K: int = 10, chunk: int = 16384
) -> jnp.ndarray:
    """KNN over a bank streamed in chunks with a running top-k merge.

    Bounds peak memory at [T, chunk] instead of [T, N]; exact same result
    as `knn_indices`.
    """
    T = feats.shape[0]
    N = feat_database.shape[0]
    K = min(K, N)  # same graceful degradation as knn_indices: without the
    # clamp, banks smaller than K would keep -inf sentinel columns whose
    # index-0 duplicates feed LLE a singular Gram
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    # Pad the bank with +inf-distance sentinels (zeros rows, inf mask).
    bank = jnp.pad(feat_database, ((0, pad), (0, 0)))
    valid = jnp.arange(n_chunks * chunk) < N
    q_norm = jnp.sum(feats**2, axis=-1, keepdims=True)

    def body(carry, ck):
        best_neg, best_idx = carry
        rows, row_valid, base = ck
        b_norm = jnp.sum(rows**2, axis=-1)
        dist = q_norm + b_norm[None, :] - 2.0 * jnp.matmul(feats, rows.T, precision=jax.lax.Precision.HIGHEST)
        neg = jnp.where(row_valid[None, :], -dist, -jnp.inf)
        idx = base + jnp.arange(rows.shape[0])
        cand_neg = jnp.concatenate([best_neg, neg], axis=1)
        cand_idx = jnp.concatenate([best_idx, jnp.broadcast_to(idx[None], (T, rows.shape[0]))], axis=1)
        top_neg, pos = jax.lax.top_k(cand_neg, K)
        top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
        return (top_neg, top_idx), None

    init = (jnp.full((T, K), -jnp.inf), jnp.zeros((T, K), jnp.int32))
    chunks = (
        bank.reshape(n_chunks, chunk, -1),
        valid.reshape(n_chunks, chunk),
        jnp.arange(n_chunks) * chunk,
    )
    (_, idx), _ = jax.lax.scan(body, init, chunks)
    return idx


@jax.jit
def solve_lle_weights(feats: jnp.ndarray, neighbors: jnp.ndarray):
    """Batched LLE reconstruction weights (sum-to-one constrained LS).

    Vectorised equivalent of utils.py:121-179: for each frame t solve
        min || feat_t - w @ neighbors_t ||   s.t.  sum(w) = 1
    via the reduced unconstrained system B = A w' with
    A = (f_2-f_1, ..., f_K-f_1), then w_1 = 1 - sum(w').  Solved with a
    batched normal-equation solve on the MXU.

    Args:
        feats: [T, D] targets.  neighbors: [T, K, D] per-frame bases.
    Returns:
        (weights [T, K], reconstruction [T, D]).
    """
    f1 = neighbors[:, 0, :]  # [T, D]
    A = neighbors[:, 1:, :] - f1[:, None, :]  # [T, K-1, D]
    B = feats - f1  # [T, D]
    gram = jnp.einsum("tkd,tld->tkl", A, A, precision=jax.lax.Precision.HIGHEST)
    rhs = jnp.einsum("tkd,td->tk", A, B, precision=jax.lax.Precision.HIGHEST)
    w_rest = jnp.linalg.solve(gram, rhs[..., None])[..., 0]  # [T, K-1]
    w0 = 1.0 - w_rest.sum(axis=-1, keepdims=True)
    w = jnp.concatenate([w0, w_rest], axis=-1)  # [T, K]
    # a singular Gram (duplicate neighbor rows - e.g. a feature bank with
    # repeated still frames) yields NaN weights from the exact solve; the
    # reference's numpy solve raises there.  Raising is impossible under
    # jit, so degrade per-frame to uniform weights (the 1/K barycentre of
    # the duplicated neighborhood) instead of propagating NaN landmarks.
    finite = jnp.all(jnp.isfinite(w), axis=-1, keepdims=True)
    w = jnp.where(finite, w, 1.0 / w.shape[-1])
    recon = jnp.einsum("tk,tkd->td", w, neighbors,
                       precision=jax.lax.Precision.HIGHEST)
    return w, recon


@functools.partial(jax.jit, static_argnames=("K",))
def lle_project(
    feats: jnp.ndarray,
    feat_database: jnp.ndarray,
    K: int = 10,
    percent: float = 1.0,
):
    """Full manifold-projection stage: KNN + LLE + blend (demo.py:196-200).

    Returns feats * (1 - percent) + reconstruction * percent.
    """
    idx = knn_indices(feats, feat_database, K)
    neighbors = feat_database[idx]  # [T, K, D]
    _, recon = solve_lle_weights(feats, neighbors)
    return feats * (1.0 - percent) + recon * percent
