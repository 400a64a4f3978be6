"""Synthetic fixed-capacity scene-graph batches for the layout stack.

Mirrors the contract of the reference layout collate
(``lidm/data/nuscenes_layout_dataset.py:445`` collate_fn): a batch of scenes is
flattened into one padded graph with node/predicate masks and scene ids — the
TPU-native replacement for ragged python-list batches.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def synthetic_graph_batch(rng: np.random.Generator, n_scenes: int = 4,
                          max_objs_per_scene: int = 8,
                          max_triples_per_scene: int = 12,
                          num_obj_classes: int = 32, num_pred_classes: int = 16,
                          clip_dim: int = 512,
                          with_changes: bool = False) -> Dict[str, np.ndarray]:
    """Returns the padded-graph dict consumed by SceneGraphEncoder /
    LayoutDiffusion (see encoders/scene_graph.py docstring for keys)."""
    N = n_scenes * max_objs_per_scene
    T = n_scenes * max_triples_per_scene

    objs = np.zeros((N,), np.int32)
    obj_mask = np.zeros((N,), bool)
    boxes = np.zeros((N, 7), np.float32)
    scene_ids = np.zeros((N,), np.int32)
    triples = np.zeros((T, 3), np.int32)
    pred_mask = np.zeros((T,), bool)

    for s in range(n_scenes):
        n_obj = int(rng.integers(2, max_objs_per_scene + 1))
        base = s * max_objs_per_scene
        scene_ids[base:base + max_objs_per_scene] = s
        for i in range(n_obj):
            objs[base + i] = rng.integers(1, num_obj_classes)
            obj_mask[base + i] = True
            boxes[base + i] = [*rng.uniform(0.5, 4.0, 3),    # size
                               *rng.uniform(-20, 20, 2),     # loc xy
                               rng.uniform(-2, 0),           # loc z
                               rng.uniform(-np.pi, np.pi)]   # yaw
        n_tri = int(rng.integers(1, max_triples_per_scene + 1))
        tbase = s * max_triples_per_scene
        for j in range(n_tri):
            a, b = rng.integers(0, n_obj, 2)
            triples[tbase + j] = [base + a, rng.integers(0, num_pred_classes),
                                  base + b]
            pred_mask[tbase + j] = True

    text_feat = rng.standard_normal((N, clip_dim)).astype(np.float32)
    rel_feat = rng.standard_normal((T, clip_dim)).astype(np.float32)

    enc_to_dec = np.arange(N, dtype=np.int32)
    changed = np.zeros((N,), bool)
    if with_changes:
        for s in range(n_scenes):
            base = s * max_objs_per_scene
            k = base + int(rng.integers(0, max_objs_per_scene))
            if obj_mask[k]:
                changed[k] = True

    return {
        "enc_objs": objs, "enc_triples": triples, "enc_text_feat": text_feat,
        "enc_rel_feat": rel_feat, "enc_pred_mask": pred_mask,
        "dec_objs": objs, "dec_triples": triples, "dec_text_feat": text_feat,
        "dec_rel_feat": rel_feat, "dec_pred_mask": pred_mask,
        "dec_boxes": boxes, "dec_objs_to_scene": scene_ids,
        "enc_to_dec": enc_to_dec, "changed_mask": changed,
        "obj_mask": obj_mask, "n_scenes": np.int32(n_scenes),
    }
