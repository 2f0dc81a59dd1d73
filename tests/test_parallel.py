"""Multi-device sharding test on the virtual CPU mesh (SURVEY.md §4 implication)."""

import jax
import pytest

from fastdm_tpu.parallel.mesh import factor_mesh, flux_dryrun_step, make_mesh


def test_factor_mesh():
    assert factor_mesh(8) == (1, 2, 4)
    assert factor_mesh(4) == (1, 1, 4)
    assert factor_mesh(1) == (1, 1, 1)
    assert factor_mesh(3) == (3, 1, 1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_flux_dryrun_8dev():
    flux_dryrun_step(8)
