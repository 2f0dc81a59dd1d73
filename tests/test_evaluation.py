"""Evaluation tooling math (examples/evaluation/): FID stats caching is
exactly equivalent to the direct two-set computation, and the Frechet
distance behaves (0 for identical stats, grows with mean separation).
Model-download-dependent pieces (CLIP/Inception extractors) are exercised
only when their checkpoints are reachable, never in CI."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples",
                                "evaluation"))

pytest.importorskip("scipy")

from fid import frechet_distance, frechet_from_stats, gaussian_stats


def test_frechet_stats_equivalence():
    rng = np.random.default_rng(0)
    f1 = rng.standard_normal((256, 16))
    f2 = rng.standard_normal((256, 16)) + 0.5
    direct = frechet_distance(f1, f2)
    via_stats = frechet_from_stats(*gaussian_stats(f1), *gaussian_stats(f2))
    assert np.isclose(direct, via_stats)
    # cached-stats path survives an npz round trip bit-exactly
    mu, sigma = gaussian_stats(f2)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "stats.npz")
        np.savez(p, mu=mu, sigma=sigma)
        z = np.load(p)
        assert np.isclose(
            frechet_from_stats(*gaussian_stats(f1), z["mu"], z["sigma"]),
            direct)


def test_frechet_distance_properties():
    rng = np.random.default_rng(1)
    f = rng.standard_normal((512, 8))
    assert frechet_distance(f, f) < 1e-6
    near = frechet_distance(f, f + 0.1)
    far = frechet_distance(f, f + 1.0)
    assert 0 < near < far
    # constant shift c only moves the means: FID = dim * c^2 exactly
    assert np.isclose(far - near, 8 * (1.0 - 0.01), atol=1e-6)
