"""Reference-width shape smokes for the vendored-zoo backbones (VERDICT r3 #7).

Each test instantiates the *reference-scale* config — the widths of the
pointcept originals, not the compact test configs — and runs ONE forward on a
small cloud. This catches the "compact defaults hide scale bugs" class:
head/channel mismatches, per-level table sizing, divisibility assumptions.

Reference widths:
  - ST-v1m1 ctor defaults channels (48, 96, 192, 384), depths (2, 2, 6, 2)
    (stratified_transformer_v1m1_origin.py:650-674 + s3dis config)
  - OctFormer-v1m1 ctor defaults channels (96, 192, 384, 384),
    num_blocks (2, 2, 18, 2) (octformer_v1m1_base.py:508-525)
  - Swin3D-v1m1 5-layer table channels (48, 96, 192, 384, 384)
    (swin3d_v1m1_base.py:14-33 + small config)
  - Sonata-v1m1 head 4096 hidden / 512 embed / 4096 prototypes
    (sonata_v1m1_base.py:73-102)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # reference-width instantiations; --runslow tier


def _cloud(rng, n, in_ch, extent=8.0, valid_frac=0.85):
    coord = rng.uniform(0.0, extent, size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, in_ch)).astype(np.float32)
    mask = np.arange(n) < int(n * valid_frac)
    return jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask)


def test_stratified_reference_width_forward():
    from lidar_layout_tpu.models.stratified import (StratifiedConfig,
                                                    StratifiedTransformer)
    cfg = StratifiedConfig(num_classes=13)     # ctor defaults = reference scale
    assert cfg.channels == (48, 96, 192, 384)
    assert cfg.depths == (2, 2, 6, 2)
    coord, feat, mask = _cloud(np.random.default_rng(0), 256, cfg.in_channels)
    model = StratifiedTransformer(cfg)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out = model.apply(params, coord, feat, mask)
    assert out.shape == (256, 13)
    assert np.isfinite(np.asarray(out)).all()


def test_octformer_reference_width_forward():
    from lidar_layout_tpu.models.octformer import OctFormer, OctFormerConfig
    cfg = OctFormerConfig(num_classes=13, capacity=1024)
    assert cfg.channels == (96, 192, 384, 384)
    assert cfg.num_blocks == (2, 2, 18, 2)
    assert cfg.num_heads == (6, 12, 24, 24)
    coord, feat, mask = _cloud(np.random.default_rng(1), 256, cfg.in_channels)
    model = OctFormer(cfg)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out = model.apply(params, coord, feat, mask)
    assert out.shape == (256, 13)
    assert np.isfinite(np.asarray(out)).all()


def test_swin3d_reference_width_forward():
    from lidar_layout_tpu.models.swin3d import Swin3DConfig, Swin3DUNet
    cfg = Swin3DConfig(num_classes=13, capacity=1024)
    assert cfg.channels == (48, 96, 192, 384, 384)   # the 5-layer table
    assert cfg.depths == (2, 4, 9, 4, 4)
    assert cfg.num_heads == (6, 6, 12, 24, 24)
    coord, feat, mask = _cloud(np.random.default_rng(2), 256, cfg.in_channels)
    model = Swin3DUNet(cfg)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out = model.apply(params, coord, feat, mask)
    assert out.shape == (256, 13)
    assert np.isfinite(np.asarray(out)).all()


def test_sonata_reference_width_head_forward():
    from lidar_layout_tpu.models.ptv3 import PTv3Config
    from lidar_layout_tpu.models.sonata import Sonata, SonataConfig
    bb = PTv3Config()                       # PT-v3 default widths (enc 32..512)
    cfg = SonataConfig(head_in_channels=bb.dec_channels[0],
                       head_hidden_channels=4096,   # reference :77
                       head_embed_channels=512,     # reference :78
                       head_num_prototypes=4096)    # reference :79
    coord, feat, mask = _cloud(np.random.default_rng(3), 256,
                               bb.in_channels)
    model = Sonata(bb, cfg)
    state = model.init(jax.random.key(0), coord, feat, mask)
    assert state["center"].shape == (4096,)
    out = model.net.apply(state["student"], coord, feat, mask)
    for head in ("mask_sim", "unmask_sim"):
        assert out[head].shape[-1] == 4096  # prototype logits, reference width
        assert np.isfinite(np.asarray(out[head])).all()
