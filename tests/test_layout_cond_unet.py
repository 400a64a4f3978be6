"""Layout-conditioned range LiDM: layout encoder + object-aware cross U-Net."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.encoders.layout_encoder import (LayoutEncoderConfig,
                                                      LayoutTransformerEncoder,
                                                      patch_bboxes)
from lidar_layout_tpu.models.object_cross_unet import (LayoutDiffusionUNetModel,
                                                       LayoutUNetConfig)

ENC_CFG = LayoutEncoderConfig(layout_length=13, hidden_dim=64, output_dim=128,
                              num_layers=2, num_heads=4, num_classes=9,
                              feature_map_size=(8, 32),
                              resolution_to_attention=(8, 4))
UNET_CFG = LayoutUNetConfig(in_channels=8, model_channels=32, out_channels=8,
                            num_res_blocks=1, channel_mult=(1, 2),
                            attention_ds=(1, 2), encoder_channels=64,
                            num_head_channels=8, image_size=(8, 32))


def layout_batch(rng, b=2, l=13):
    boxes = rng.uniform(-1, 1, (b, l, 8)).astype(np.float32)
    bbox2d = rng.uniform(0, 1, (b, l, 4)).astype(np.float32)
    cls = rng.integers(0, 9, (b, l, 1)).astype(np.float32)
    cls[:, -3:] = 0  # padding slots
    return jnp.asarray(np.concatenate([boxes, bbox2d, cls], -1))


class TestLayoutEncoder:
    def test_outputs(self, rng):
        layout = layout_batch(rng)
        enc = LayoutTransformerEncoder(ENC_CFG)
        params = enc.init(jax.random.key(0), layout)
        out = enc.apply(params, layout)
        assert out["xf_out"].shape == (2, 13, 64)
        assert out["xf_proj"].shape == (2, 128)
        assert out["key_padding_mask"].shape == (2, 13)
        assert not np.asarray(out["key_padding_mask"])[:, -1].any()
        # patch embeddings exist per configured resolution with H*W rows
        assert out["image_patch_bbox_embedding_res8"].shape == (2, 8 * 32, 64)
        assert out["image_patch_bbox_embedding_res4"].shape == (2, 4 * 16, 64)

    def test_patch_bboxes_cover_unit(self):
        pb = patch_bboxes(4, 8)
        assert pb.shape == (32, 4)
        assert pb.min() == 0.0 and pb.max() == 1.0


class TestLayoutUNet:
    def test_forward_and_conditioning_sensitivity(self, rng):
        layout = layout_batch(rng)
        enc = LayoutTransformerEncoder(ENC_CFG)
        ep = enc.init(jax.random.key(0), layout)
        cond = enc.apply(ep, layout)
        # xf_proj must match time_embed_dim for the fuse-add
        cond["xf_proj"] = jnp.pad(cond["xf_proj"], ((0, 0), (0, 0)))

        model = LayoutDiffusionUNetModel(UNET_CFG)
        z = jnp.asarray(rng.standard_normal((2, 8, 32, 8)), jnp.float32)
        t = jnp.asarray([5, 20])
        params = model.init(jax.random.key(1), z, t, cond)
        out = model.apply(params, z, t, cond)
        assert out.shape == z.shape
        assert np.isfinite(np.asarray(out)).all()

        # different layout -> different output (conditioning flows), after
        # perturbing off the zero-init point
        leaves, td = jax.tree.flatten(params)
        ks = jax.random.split(jax.random.key(2), len(leaves))
        params = jax.tree.unflatten(td, [
            l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, ks)])
        out1 = model.apply(params, z, t, cond)
        cond2 = enc.apply(ep, layout_batch(np.random.default_rng(9)))
        out2 = model.apply(params, z, t, cond2)
        assert float(jnp.abs(out1 - out2).max()) > 1e-7
