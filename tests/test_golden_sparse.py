"""Golden parity: our radial block mask vs the reference's
gen_log_mask_shrinked (bit-for-bit, mask generation is pure host math)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_harness import stub_reference_deps


@pytest.mark.parametrize("num_frame,tpf,decay", [(8, 128, 0.5), (12, 256, 1.0),
                                                 (6, 128, 0.2)])
def test_radial_mask_matches_reference(num_frame, tpf, decay):
    stub_reference_deps()
    try:
        from fastdm.sparse.config import RadialAttnConfig as RefCfg
        from fastdm.sparse.xsparse import RadialAttn as RefRadial
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    from fastdm_tpu.sparse.config import RadialAttnConfig
    from fastdm_tpu.sparse.xsparse import radial_block_mask

    s = num_frame * tpf
    ref = RefRadial(RefCfg(sparse_algorithm="radial", block_size=128,
                           decay_factor=decay, model_type="wan"))
    ref.post_init(video_token_num=s, num_frame=num_frame)
    RefRadial._log_mask = None  # class-level cache: reset between params
    ref_mask = np.asarray(ref.gen_log_mask_shrinked(s, "cpu").cpu(), bool)

    cfg = RadialAttnConfig(block_size=128, decay_factor=decay, model_type="wan")
    ours = np.asarray(radial_block_mask(s, num_frame, cfg), bool)

    assert ours.shape == ref_mask.shape
    assert (ours == ref_mask).all(), (
        f"mask mismatch: {int((ours != ref_mask).sum())} of {ours.size} blocks"
    )
