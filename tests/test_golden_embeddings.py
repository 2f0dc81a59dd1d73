"""Golden parity: conditional-embedding modules vs the torch reference
(TextImageProjection, AttentionPooling, TextTimeEmbedding,
TextImageTimeEmbedding — ref: fastdm/layer/embeddings.py:412-525). These feed
the SDXL-ControlNet config branches (ref: controlnets.py:255-325)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_harness import rel_err, stub_reference_deps, to_cpu


def _ref_modules():
    stub_reference_deps()
    try:
        from fastdm.layer import embeddings as ref_emb
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    return ref_emb


def _load_qlinear(ql, w, b=None):
    ql.weight_loading_and_quant(
        [torch.from_numpy(w).transpose(0, 1)],
        [torch.from_numpy(b) if b is not None else None],
        quant_type=None,
    )


def _lin(rng, n, k, scale=0.05, bias=True):
    w = rng.standard_normal((n, k)).astype(np.float32) * scale
    b = rng.standard_normal((n,)).astype(np.float32) * 0.02 if bias else None
    return w, b


def test_text_image_projection_matches_reference():
    ref_emb = _ref_modules()
    import jax.numpy as jnp

    from fastdm_tpu.layers.embeddings import text_image_projection_apply
    from fastdm_tpu.models.controlnets import _cn_encoder_hid_p
    from fastdm_tpu.models.loader import TensorSource

    rng = np.random.default_rng(0)
    text_dim, img_dim, cad, n_tok = 32, 24, 16, 10
    iw, ib = _lin(rng, n_tok * cad, img_dim)
    tw, tb = _lin(rng, cad, text_dim)

    ref = ref_emb.TextImageProjection(
        text_embed_dim=text_dim, image_embed_dim=img_dim,
        cross_attention_dim=cad, num_image_text_embeds=n_tok,
        data_type=torch.float32,
    )
    to_cpu(ref)
    _load_qlinear(ref.image_embeds, iw, ib)
    _load_qlinear(ref.text_proj, tw, tb)

    text = rng.standard_normal((2, 7, text_dim)).astype(np.float32)
    img = rng.standard_normal((2, img_dim)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward(torch.from_numpy(text), torch.from_numpy(img)).numpy()

    src = TensorSource({
        "encoder_hid_proj.image_embeds.weight": iw,
        "encoder_hid_proj.image_embeds.bias": ib,
        "encoder_hid_proj.text_proj.weight": tw,
        "encoder_hid_proj.text_proj.bias": tb,
    })
    params = _cn_encoder_hid_p(src)
    got = np.asarray(
        text_image_projection_apply(params, jnp.asarray(text), jnp.asarray(img), n_tok),
        np.float32,
    )
    assert got.shape == want.shape == (2, n_tok + 7, cad)
    assert rel_err(got, want) < 0.01


def test_attention_pooling_matches_reference():
    ref_emb = _ref_modules()
    import jax.numpy as jnp

    from fastdm_tpu.layers.embeddings import attention_pooling_apply

    rng = np.random.default_rng(1)
    d, heads = 64, 4
    pos = (rng.standard_normal((1, d)).astype(np.float32) / d**0.5)
    qw, qb = _lin(rng, d, d)
    kw, kb = _lin(rng, d, d)
    vw, vb = _lin(rng, d, d)

    ref = ref_emb.AttentionPooling(heads, d, dtype=torch.float32)
    to_cpu(ref)
    ref.positional_embedding = torch.nn.Parameter(torch.from_numpy(pos))
    _load_qlinear(ref.q_proj, qw, qb)
    _load_qlinear(ref.k_proj, kw, kb)
    _load_qlinear(ref.v_proj, vw, vb)

    x = rng.standard_normal((2, 9, d)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward(torch.from_numpy(x)).numpy()

    params = {
        "positional_embedding": jnp.asarray(pos),
        "q_proj": {"w": jnp.asarray(qw.T), "bias": jnp.asarray(qb)},
        "k_proj": {"w": jnp.asarray(kw.T), "bias": jnp.asarray(kb)},
        "v_proj": {"w": jnp.asarray(vw.T), "bias": jnp.asarray(vb)},
    }
    got = np.asarray(attention_pooling_apply(params, jnp.asarray(x), heads), np.float32)
    assert got.shape == want.shape == (2, d)
    assert rel_err(got, want) < 0.01


def test_text_time_embedding_matches_reference():
    ref_emb = _ref_modules()
    import jax.numpy as jnp

    from fastdm_tpu.layers.embeddings import text_time_embedding_apply
    from fastdm_tpu.models.controlnets import _cn_add_embedding_p
    from fastdm_tpu.models.loader import TensorSource

    rng = np.random.default_rng(2)
    enc_dim, time_dim, heads = 32, 48, 4
    sd = {
        "add_embedding.norm1.weight": (1 + 0.1 * rng.standard_normal(enc_dim)).astype(np.float32),
        "add_embedding.norm1.bias": (0.05 * rng.standard_normal(enc_dim)).astype(np.float32),
        "add_embedding.pool.positional_embedding":
            (rng.standard_normal((1, enc_dim)).astype(np.float32) / enc_dim**0.5),
        "add_embedding.norm2.weight": (1 + 0.1 * rng.standard_normal(time_dim)).astype(np.float32),
        "add_embedding.norm2.bias": (0.05 * rng.standard_normal(time_dim)).astype(np.float32),
    }
    for nm, n, k in (("pool.q_proj", enc_dim, enc_dim), ("pool.k_proj", enc_dim, enc_dim),
                     ("pool.v_proj", enc_dim, enc_dim), ("proj", time_dim, enc_dim)):
        w, b = _lin(rng, n, k)
        sd[f"add_embedding.{nm}.weight"] = w
        sd[f"add_embedding.{nm}.bias"] = b

    ref = ref_emb.TextTimeEmbedding(enc_dim, time_dim, num_heads=heads,
                                    data_type=torch.float32)
    to_cpu(ref)
    ref.norm1_gamma = torch.from_numpy(sd["add_embedding.norm1.weight"])
    ref.norm1_beta = torch.from_numpy(sd["add_embedding.norm1.bias"])
    ref.norm2_gamma = torch.from_numpy(sd["add_embedding.norm2.weight"])
    ref.norm2_beta = torch.from_numpy(sd["add_embedding.norm2.bias"])
    ref.pool.positional_embedding = torch.nn.Parameter(
        torch.from_numpy(sd["add_embedding.pool.positional_embedding"])
    )
    for nm, ql in (("pool.q_proj", ref.pool.q_proj), ("pool.k_proj", ref.pool.k_proj),
                   ("pool.v_proj", ref.pool.v_proj), ("proj", ref.proj)):
        _load_qlinear(ql, sd[f"add_embedding.{nm}.weight"], sd[f"add_embedding.{nm}.bias"])

    x = rng.standard_normal((2, 11, enc_dim)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward(torch.from_numpy(x)).numpy()

    params = _cn_add_embedding_p(TensorSource(sd))
    assert "pool" in params  # detected as addition_embed_type == "text"
    got = np.asarray(
        text_time_embedding_apply(params, jnp.asarray(x), heads), np.float32
    )
    assert rel_err(got, want) < 0.01


def test_text_image_time_embedding_matches_reference():
    ref_emb = _ref_modules()
    import jax.numpy as jnp

    from fastdm_tpu.layers.embeddings import text_image_time_embedding_apply
    from fastdm_tpu.models.controlnets import _cn_add_embedding_p
    from fastdm_tpu.models.loader import TensorSource

    rng = np.random.default_rng(3)
    text_dim, img_dim, time_dim = 24, 20, 32
    tw, tb = _lin(rng, time_dim, text_dim)
    iw, ib = _lin(rng, time_dim, img_dim)
    sd = {
        "add_embedding.text_proj.weight": tw,
        "add_embedding.text_proj.bias": tb,
        "add_embedding.text_norm.weight": (1 + 0.1 * rng.standard_normal(time_dim)).astype(np.float32),
        "add_embedding.text_norm.bias": (0.05 * rng.standard_normal(time_dim)).astype(np.float32),
        "add_embedding.image_proj.weight": iw,
        "add_embedding.image_proj.bias": ib,
    }

    ref = ref_emb.TextImageTimeEmbedding(text_dim, img_dim, time_dim,
                                         data_type=torch.float32)
    to_cpu(ref)
    ref.text_norm_gamma = torch.from_numpy(sd["add_embedding.text_norm.weight"])
    ref.text_norm_beta = torch.from_numpy(sd["add_embedding.text_norm.bias"])
    _load_qlinear(ref.text_proj, tw, tb)
    _load_qlinear(ref.image_proj, iw, ib)

    text = rng.standard_normal((2, text_dim)).astype(np.float32)
    img = rng.standard_normal((2, img_dim)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward(torch.from_numpy(text), torch.from_numpy(img)).numpy()

    params = _cn_add_embedding_p(TensorSource(sd))
    assert "text_proj" in params  # detected as "text_image"
    got = np.asarray(
        text_image_time_embedding_apply(params, jnp.asarray(text), jnp.asarray(img)),
        np.float32,
    )
    assert rel_err(got, want) < 0.01


def test_cn_class_embedding_layout_detection():
    from fastdm_tpu.models.controlnets import _cn_class_embedding_p
    from fastdm_tpu.models.loader import TensorSource

    table = TensorSource({"class_embedding.weight": np.zeros((5, 8), np.float32)})
    p = _cn_class_embedding_p(table)
    assert "weight" in p and p["weight"].shape == (5, 8)

    mlp = TensorSource({
        "class_embedding.linear_1.weight": np.zeros((8, 4), np.float32),
        "class_embedding.linear_1.bias": np.zeros((8,), np.float32),
        "class_embedding.linear_2.weight": np.zeros((8, 8), np.float32),
        "class_embedding.linear_2.bias": np.zeros((8,), np.float32),
    })
    p = _cn_class_embedding_p(mlp)
    assert "linear1" in p and "linear2" in p

    assert _cn_class_embedding_p(TensorSource({})) is None
