"""Forward parity of the CLIP towers against an independent implementation.

VERDICT r2 weak #5 / task #4: the converters were template-tested but no test
asserted jax forward == torch forward on real random weights. The reference
loads OpenAI ``clip.load('ViT-L/14')`` (lidm/modules/encoders/modules.py:141,
196); neither the ``clip`` package nor torchsparse exists in this image, but
HuggingFace ``transformers``' CLIP is an independent, widely-validated torch
implementation of the SAME architecture (quick_gelu, causal text tower,
pre-LN ViT). These tests instantiate HF CLIP at a reduced shape with random
weights, remap its state dict into the OpenAI naming our converter consumes,
and assert the jax towers reproduce the torch forward numerically.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lidar_layout_tpu.encoders.clip_convert import (convert_clip_image,  # noqa: E402
                                                    convert_clip_text)
from lidar_layout_tpu.encoders.modules import (ImageTransformerEncoder,  # noqa: E402
                                               TextTransformerEncoder)

WIDTH, LAYERS, HEADS, VOCAB, MAXLEN = 64, 2, 4, 997, 77


def _hf_to_openai_text(tm, proj_w):
    """CLIPTextModel state dict -> OpenAI clip naming."""
    sd = {k: v.detach() for k, v in tm.state_dict().items()}
    out = {
        "token_embedding.weight": sd["embeddings.token_embedding.weight"],
        "positional_embedding": sd["embeddings.position_embedding.weight"],
        "ln_final.weight": sd["final_layer_norm.weight"],
        "ln_final.bias": sd["final_layer_norm.bias"],
        "text_projection": proj_w.detach().T,
    }
    for i in range(LAYERS):
        src = f"encoder.layers.{i}"
        dst = f"transformer.resblocks.{i}"
        out[f"{dst}.ln_1.weight"] = sd[f"{src}.layer_norm1.weight"]
        out[f"{dst}.ln_1.bias"] = sd[f"{src}.layer_norm1.bias"]
        out[f"{dst}.ln_2.weight"] = sd[f"{src}.layer_norm2.weight"]
        out[f"{dst}.ln_2.bias"] = sd[f"{src}.layer_norm2.bias"]
        out[f"{dst}.attn.in_proj_weight"] = torch.cat(
            [sd[f"{src}.self_attn.{p}_proj.weight"] for p in "qkv"])
        out[f"{dst}.attn.in_proj_bias"] = torch.cat(
            [sd[f"{src}.self_attn.{p}_proj.bias"] for p in "qkv"])
        out[f"{dst}.attn.out_proj.weight"] = sd[f"{src}.self_attn.out_proj.weight"]
        out[f"{dst}.attn.out_proj.bias"] = sd[f"{src}.self_attn.out_proj.bias"]
        out[f"{dst}.mlp.c_fc.weight"] = sd[f"{src}.mlp.fc1.weight"]
        out[f"{dst}.mlp.c_fc.bias"] = sd[f"{src}.mlp.fc1.bias"]
        out[f"{dst}.mlp.c_proj.weight"] = sd[f"{src}.mlp.fc2.weight"]
        out[f"{dst}.mlp.c_proj.bias"] = sd[f"{src}.mlp.fc2.bias"]
    return out


class TestTextTowerParity:
    @pytest.fixture(scope="class")
    def pair(self):
        cfg = transformers.CLIPTextConfig(
            vocab_size=VOCAB, hidden_size=WIDTH, intermediate_size=WIDTH * 4,
            num_hidden_layers=LAYERS, num_attention_heads=HEADS,
            max_position_embeddings=MAXLEN, hidden_act="quick_gelu")
        torch.manual_seed(0)
        hf = transformers.CLIPTextModel(cfg).text_model.eval()
        proj = torch.nn.Linear(WIDTH, WIDTH, bias=False)
        sd = _hf_to_openai_text(hf, proj.weight)
        params = convert_clip_text(sd, layers=LAYERS, heads=HEADS)
        ours = TextTransformerEncoder(vocab_size=VOCAB, max_len=MAXLEN,
                                      width=WIDTH, layers=LAYERS, heads=HEADS)
        return hf, proj, ours, params

    def test_sequence_output_matches(self, pair):
        hf, _, ours, params = pair
        tokens = np.random.default_rng(0).integers(1, VOCAB, (2, 16))
        with torch.no_grad():
            ref = hf(input_ids=torch.as_tensor(tokens)).last_hidden_state
        out = ours.apply(params, jnp.asarray(tokens), pool=False)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=2e-5, rtol=2e-5)

    def test_pooled_projection_matches(self, pair):
        hf, proj, ours, params = pair
        tokens = np.random.default_rng(1).integers(1, VOCAB, (2, 16))
        with torch.no_grad():
            seq = hf(input_ids=torch.as_tensor(tokens)).last_hidden_state
            eot = tokens.argmax(-1)
            ref = proj(seq[torch.arange(2), torch.as_tensor(eot)])
        out = ours.apply(params, jnp.asarray(tokens), pool=True)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=2e-5, rtol=2e-5)


def _hf_to_openai_vision(vm, proj_w):
    sd = {k: v.detach() for k, v in vm.state_dict().items()}
    out = {
        "visual.conv1.weight": sd["embeddings.patch_embedding.weight"],
        "visual.class_embedding": sd["embeddings.class_embedding"],
        "visual.positional_embedding": sd["embeddings.position_embedding.weight"],
        "visual.ln_pre.weight": sd["pre_layrnorm.weight"],
        "visual.ln_pre.bias": sd["pre_layrnorm.bias"],
        "visual.ln_post.weight": sd["post_layernorm.weight"],
        "visual.ln_post.bias": sd["post_layernorm.bias"],
        "visual.proj": proj_w.detach().T,
    }
    for i in range(LAYERS):
        src = f"encoder.layers.{i}"
        dst = f"visual.transformer.resblocks.{i}"
        out[f"{dst}.ln_1.weight"] = sd[f"{src}.layer_norm1.weight"]
        out[f"{dst}.ln_1.bias"] = sd[f"{src}.layer_norm1.bias"]
        out[f"{dst}.ln_2.weight"] = sd[f"{src}.layer_norm2.weight"]
        out[f"{dst}.ln_2.bias"] = sd[f"{src}.layer_norm2.bias"]
        out[f"{dst}.attn.in_proj_weight"] = torch.cat(
            [sd[f"{src}.self_attn.{p}_proj.weight"] for p in "qkv"])
        out[f"{dst}.attn.in_proj_bias"] = torch.cat(
            [sd[f"{src}.self_attn.{p}_proj.bias"] for p in "qkv"])
        out[f"{dst}.attn.out_proj.weight"] = sd[f"{src}.self_attn.out_proj.weight"]
        out[f"{dst}.attn.out_proj.bias"] = sd[f"{src}.self_attn.out_proj.bias"]
        out[f"{dst}.mlp.c_fc.weight"] = sd[f"{src}.mlp.fc1.weight"]
        out[f"{dst}.mlp.c_fc.bias"] = sd[f"{src}.mlp.fc1.bias"]
        out[f"{dst}.mlp.c_proj.weight"] = sd[f"{src}.mlp.fc2.weight"]
        out[f"{dst}.mlp.c_proj.bias"] = sd[f"{src}.mlp.fc2.bias"]
    return out


class TestImageTowerParity:
    IMG, PATCH = 28, 14

    @pytest.fixture(scope="class")
    def pair(self):
        cfg = transformers.CLIPVisionConfig(
            hidden_size=WIDTH, intermediate_size=WIDTH * 4,
            num_hidden_layers=LAYERS, num_attention_heads=HEADS,
            image_size=self.IMG, patch_size=self.PATCH,
            hidden_act="quick_gelu")
        torch.manual_seed(1)
        hf = transformers.CLIPVisionModel(cfg).vision_model.eval()
        proj = torch.nn.Linear(WIDTH, 32, bias=False)
        sd = _hf_to_openai_vision(hf, proj.weight)
        params = convert_clip_image(sd, layers=LAYERS, heads=HEADS)
        ours = ImageTransformerEncoder(image_size=self.IMG, patch=self.PATCH,
                                       width=WIDTH, layers=LAYERS,
                                       heads=HEADS, out_dim=32)
        return hf, proj, ours, params

    def test_sequence_output_matches(self, pair):
        hf, _, ours, params = pair
        img = np.random.default_rng(2).normal(
            size=(2, self.IMG, self.IMG, 3)).astype(np.float32)
        with torch.no_grad():
            ref = hf(pixel_values=torch.as_tensor(
                img.transpose(0, 3, 1, 2))).last_hidden_state
            # HF last_hidden_state is pre-post_layernorm; ours applies
            # ln_post before returning — normalize the torch side the same
            ref = hf.post_layernorm(ref)
        out = ours.apply(params, jnp.asarray(img), pool=False)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=3e-5, rtol=3e-5)

    def test_pooled_projection_matches(self, pair):
        hf, proj, ours, params = pair
        img = np.random.default_rng(3).normal(
            size=(2, self.IMG, self.IMG, 3)).astype(np.float32)
        with torch.no_grad():
            h = hf(pixel_values=torch.as_tensor(
                img.transpose(0, 3, 1, 2))).last_hidden_state
            ref = proj(hf.post_layernorm(h)[:, 0])
        out = ours.apply(params, jnp.asarray(img), pool=True)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=3e-5, rtol=3e-5)
