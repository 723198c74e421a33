"""Pallas rasteriser: interpret-mode equivalence with the XLA path
(compiled-mode equivalence is exercised on the real TPU by bench.py)."""

import numpy as np
import jax.numpy as jnp

from livespeechportraits_tpu.ops import rasterize, rasterize_pallas


def test_pallas_interpret_matches_xla():
    rng = np.random.default_rng(0)
    lm = jnp.asarray(rng.uniform(20, 100, (2, 73, 2)).astype(np.float32))
    sh = jnp.asarray(rng.uniform(20, 100, (2, 18, 2)).astype(np.float32))
    ref = np.asarray(rasterize.rasterize_feature_maps(lm, sh, (128, 128)))
    out = np.asarray(
        rasterize_pallas.rasterize_feature_maps_pallas(lm, sh, (128, 128), interpret=True)
    )
    np.testing.assert_array_equal(ref, out)


def test_pallas_culling_correct_at_tile_boundaries():
    """Segments straddling row-tile boundaries must not be culled."""
    lm = np.full((1, 73, 2), 60.0, np.float32)
    # one long vertical segment crossing the 128-row tile boundary
    lm[0, 0] = [64.0, 120.0]
    lm[0, 1] = [64.0, 140.0]
    ref = np.asarray(rasterize.rasterize_feature_maps(jnp.asarray(lm), None, (256, 128)))
    out = np.asarray(
        rasterize_pallas.rasterize_feature_maps_pallas(jnp.asarray(lm), None, (256, 128),
                                                       interpret=True)
    )
    np.testing.assert_array_equal(ref, out)
    assert out[0, 130, 64] == 1.0  # drawn on both sides of the boundary
    assert out[0, 125, 64] == 1.0


def test_supports_pallas_is_bool():
    assert isinstance(rasterize_pallas.supports_pallas(), bool)
