"""CLIP tower parity vs HF transformers modeling code (random small config).

Uses HF's CLIP *code* (bundled in the image; no weights downloaded) as the
oracle: random-init a small CLIPTextModel/CLIPVisionModel, convert the
state_dict, compare outputs. Covers the quick_gelu (openai) and gelu (laion)
activation variants the reference depends on (modules.py:137-162, 259-323).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from upgpt_tpu.models.clip import (
    CLIPTextConfig, CLIPTextTower, CLIPVisionConfig, CLIPVisionTower,
    StyleImageEncoder,
)
from upgpt_tpu.convert.clip_weights import (
    convert_hf_clip_text, convert_hf_clip_vision,
    convert_openai_clip_text,
)

transformers = pytest.importorskip("transformers")


def _hf_text_model(hidden_act="quick_gelu"):
    # eos_token_id=98 = the max id we place at the sequence end, so HF's
    # eos-position pooler and our argmax pooler (correct for the real CLIP
    # vocab where <|endoftext|>=49407 is the max id) pick the same position
    cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        hidden_act=hidden_act, eos_token_id=98,
    )
    torch.manual_seed(0)
    return transformers.CLIPTextModel(cfg).eval()


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_text_tower_parity(act):
    hf = _hf_text_model(act)
    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, num_layers=2, num_heads=4,
        max_positions=16, quick_gelu=(act == "quick_gelu"), projection_dim=32,
    )
    params = convert_hf_clip_text(hf.state_dict(), num_layers=2)
    tower = CLIPTextTower(cfg)

    rng = np.random.default_rng(0)
    # last token is the max id => acts as EOS for pooling
    ids = rng.integers(1, 90, size=(2, 16)).astype(np.int32)
    ids[:, -1] = 98

    with jax.default_matmul_precision("highest"):
        hidden, pooled = tower.apply({"params": params}, jnp.asarray(ids))

    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids).long())
    np.testing.assert_allclose(
        np.asarray(hidden), out.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )
    # HF pooler_output is the pre-projection EOS state; ours applies the
    # (identity-filled) projection, so they must match too
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5, rtol=1e-4
    )


def test_vision_tower_parity():
    cfg_hf = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(1)
    hf = transformers.CLIPVisionModel(cfg_hf).eval()

    cfg = CLIPVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, num_layers=2,
        num_heads=4, quick_gelu=True, projection_dim=32,
    )
    params = convert_hf_clip_vision(hf.state_dict(), num_layers=2)
    params["visual_projection"] = np.eye(32, dtype=np.float32)
    tower = CLIPVisionTower(cfg)

    rng = np.random.default_rng(2)
    img = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        hidden, pooled = tower.apply({"params": params}, jnp.asarray(img))

    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(img).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=3e-5, rtol=1e-4
    )


def test_openai_packed_qkv_conversion():
    """Packed in_proj (openai-clip format) must split to the same q/k/v."""
    hf = _hf_text_model()
    sd = hf.state_dict()
    # build an openai-style dict from the HF one
    packed = {}
    packed["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    packed["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    packed["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    packed["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    packed["text_projection"] = torch.eye(32)
    for i in range(2):
        hp = f"text_model.encoder.layers.{i}"
        op = f"transformer.resblocks.{i}"
        packed[f"{op}.attn.in_proj_weight"] = torch.cat(
            [sd[f"{hp}.self_attn.q_proj.weight"], sd[f"{hp}.self_attn.k_proj.weight"],
             sd[f"{hp}.self_attn.v_proj.weight"]], dim=0)
        packed[f"{op}.attn.in_proj_bias"] = torch.cat(
            [sd[f"{hp}.self_attn.q_proj.bias"], sd[f"{hp}.self_attn.k_proj.bias"],
             sd[f"{hp}.self_attn.v_proj.bias"]], dim=0)
        packed[f"{op}.attn.out_proj.weight"] = sd[f"{hp}.self_attn.out_proj.weight"]
        packed[f"{op}.attn.out_proj.bias"] = sd[f"{hp}.self_attn.out_proj.bias"]
        packed[f"{op}.ln_1.weight"] = sd[f"{hp}.layer_norm1.weight"]
        packed[f"{op}.ln_1.bias"] = sd[f"{hp}.layer_norm1.bias"]
        packed[f"{op}.ln_2.weight"] = sd[f"{hp}.layer_norm2.weight"]
        packed[f"{op}.ln_2.bias"] = sd[f"{hp}.layer_norm2.bias"]
        packed[f"{op}.mlp.c_fc.weight"] = sd[f"{hp}.mlp.fc1.weight"]
        packed[f"{op}.mlp.c_fc.bias"] = sd[f"{hp}.mlp.fc1.bias"]
        packed[f"{op}.mlp.c_proj.weight"] = sd[f"{hp}.mlp.fc2.weight"]
        packed[f"{op}.mlp.c_proj.bias"] = sd[f"{hp}.mlp.fc2.bias"]

    a = convert_hf_clip_text(sd, num_layers=2)
    b = convert_openai_clip_text(packed, num_layers=2)
    for blk in ("block_0", "block_1"):
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            np.testing.assert_array_equal(
                a[blk]["attn"][proj]["kernel"], b[blk]["attn"][proj]["kernel"]
            )


def test_style_encoder_shape():
    cfg = CLIPVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, num_layers=1,
        num_heads=4, projection_dim=16,
    )
    enc = StyleImageEncoder(cfg)
    x = jnp.zeros((2, 9, 28, 28, 3))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    out = enc.apply({"params": params}, x)
    assert out.shape == (2, 9, 16)
