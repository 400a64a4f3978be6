"""End-to-end test of scripts/convert_weights.py (the migration CLI).

Builds a reference-named torch state_dict (the reference's own model_lidm
Encoder/Decoder modules, imported read-only, plus the VQ extras), saves it the
way Lightning does ({"state_dict": ...}), runs the CLI, and checks the
produced run dir restores into this repo's model with the converted weights.
"""
import os
import runpy
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount unavailable")

DD = dict(ch=32, out_ch=2, ch_mult=[1, 2, 2],
          strides=[[1, 2], [2, 2]], num_res_blocks=1, attn_levels=[],
          dropout=0.0, in_channels=1, z_channels=4, double_z=False)

CONFIG = """
model:
  target: vq_model
  params:
    embed_dim: 4
    n_embed: 512
    use_mask: true
    ddconfig:
      double_z: false
      z_channels: 4
      in_channels: 1
      out_ch: 2
      ch: 32
      ch_mult: [1, 2, 2]
      strides: [[1, 2], [2, 2]]
      num_res_blocks: 1
      attn_levels: []
      dropout: 0.0
data:
  params:
    dataset:
      size: [16, 128]
"""


@pytest.fixture(scope="module")
def ref_sd():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from lidm.modules.diffusion import model_lidm
    except Exception as e:
        pytest.skip(f"cannot import reference modules: {e}")
    torch.manual_seed(0)
    enc = model_lidm.Encoder(**DD)
    dec = model_lidm.Decoder(**DD)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd["quantize.embedding.weight"] = torch.randn(512, 4)
    sd["quant_conv.weight"] = torch.randn(4, 4, 1, 1)
    sd["quant_conv.bias"] = torch.randn(4)
    sd["post_quant_conv.weight"] = torch.randn(4, 4, 1, 1)
    sd["post_quant_conv.bias"] = torch.randn(4)
    return torch, sd


def test_convert_ae_roundtrip(ref_sd, tmp_path):
    torch, sd = ref_sd
    ckpt = tmp_path / "model.ckpt"
    torch.save({"state_dict": sd}, str(ckpt))
    cfg_path = tmp_path / "ae.yaml"
    cfg_path.write_text(CONFIG)
    out = tmp_path / "converted"

    argv = sys.argv
    sys.argv = ["convert_weights.py", "-b", str(cfg_path), "--ckpt",
                str(ckpt), "-o", str(out)]
    try:
        runpy.run_path(os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "convert_weights.py"),
                       run_name="__main__")
    finally:
        sys.argv = argv

    assert (out / "config.yaml").exists()

    import jax
    import jax.numpy as jnp

    from lidar_layout_tpu.config import instantiate_from_config, load_yaml
    from lidar_layout_tpu.train.checkpoint import restore_checkpoint

    model = instantiate_from_config(load_yaml(str(cfg_path))["model"])
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 128, 1)))
    restored = restore_checkpoint(str(out / "ckpt"), {"params_g": params})
    got = np.asarray(
        restored["params_g"]["params"]["quantize"]["embedding"])
    np.testing.assert_allclose(got, sd["quantize.embedding.weight"].numpy(),
                               atol=1e-6)
    # converted AE runs end to end
    dec, qloss, _ = model.apply(restored["params_g"],
                                jnp.zeros((1, 16, 128, 1)))
    assert dec.shape == (1, 16, 128, 2)
    assert bool(jnp.isfinite(dec).all())


LIDM_CONFIG = """
model:
  target: latent_diffusion
  params:
    linear_start: 0.0015
    linear_end: 0.0195
    timesteps: 64
    image_size: [8, 32]
    channels: 4
    unet_config:
      target: unet
      params:
        in_channels: 4
        out_channels: 4
        model_channels: 32
        attention_resolutions: [2]
        num_res_blocks: 1
        channel_mult: [1, 2]
        num_head_channels: 8
        lib_name: lidm
    first_stage_config:
      target: vq_model_interface
      params:
        embed_dim: 4
        n_embed: 512
        use_mask: true
        ddconfig:
          double_z: false
          z_channels: 4
          in_channels: 1
          out_ch: 2
          ch: 32
          ch_mult: [1, 2, 2]
          strides: [[1, 2], [2, 2]]
          num_res_blocks: 1
          attn_levels: []
          dropout: 0.0
    cond_stage_config: __is_unconditional__
data:
  params:
    dataset:
      size: [16, 128]
"""


def test_convert_lidm_roundtrip(ref_sd, tmp_path):
    torch, ae_sd = ref_sd
    from lidm.modules.diffusion.openaimodel import UNetModel

    torch.manual_seed(1)
    unet = UNetModel(image_size=None, in_channels=4, model_channels=32,
                     out_channels=4, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_head_channels=8, lib_name="lidm")
    sd = {f"model.diffusion_model.{k}": v
          for k, v in unet.state_dict().items()}
    sd.update({f"first_stage_model.{k}": v for k, v in ae_sd.items()})
    ckpt = tmp_path / "lidm.ckpt"
    torch.save({"state_dict": sd}, str(ckpt))
    cfg_path = tmp_path / "lidm.yaml"
    cfg_path.write_text(LIDM_CONFIG)
    out = tmp_path / "converted_lidm"

    argv = sys.argv
    sys.argv = ["convert_weights.py", "-b", str(cfg_path), "--ckpt",
                str(ckpt), "-o", str(out)]
    try:
        runpy.run_path(os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "convert_weights.py"),
                       run_name="__main__")
    finally:
        sys.argv = argv

    import jax
    import jax.numpy as jnp

    from lidar_layout_tpu.config import instantiate_from_config, load_yaml
    from lidar_layout_tpu.train.checkpoint import restore_checkpoint
    from lidar_layout_tpu.train.diffusion_trainer import (create_train_state,
                                                          make_optimizer)

    model = instantiate_from_config(load_yaml(str(cfg_path))["model"])
    params = model.init(jax.random.key(0), image_shape=(16, 128, 1))
    state = create_train_state(model, params, make_optimizer(1e-4))
    state = restore_checkpoint(str(out / "ckpt"), state)

    # one leaf from each converted sub-tree round-trips exactly
    got_t = np.asarray(
        state.params["unet"]["params"]["time_embed_0"]["kernel"])
    np.testing.assert_allclose(
        got_t, sd["model.diffusion_model.time_embed.0.weight"].numpy().T,
        atol=1e-6)
    got_q = np.asarray(
        state.params["first_stage"]["params"]["quantize"]["embedding"])
    np.testing.assert_allclose(
        got_q, sd["first_stage_model.quantize.embedding.weight"].numpy(),
        atol=1e-6)

    # the converted model denoises + decodes end to end
    z = jnp.zeros((2, 8, 32, 4))
    t = jnp.zeros((2,), jnp.int32)
    eps = model.apply_model(state.params, z, t, None)
    assert eps.shape == z.shape and bool(jnp.isfinite(eps).all())
    img = model.decode_first_stage(state.params, z)
    assert img.shape == (2, 16, 128, 1) and bool(jnp.isfinite(img).all())
