"""nuScenes scene-graph layout dataset reader.

Parity: ``lidm/data/nuscenes_layout_dataset.py`` — loads
``nuscenes_infos_*.pkl`` entries (``info['scene_graph']['keep_box_names'/
'keep_box_relationships'/'keep_box']``), prepends the 'ego' node, scales boxes
(xyz min-max to [0,1], log sizes; :153-170 scale_box), and collates a batch of
scenes into ONE fixed-capacity padded graph (the TPU replacement of the ragged
collate_fn at :445). CLIP text features load from the cached pkl files the
reference writes; absent caches fall back to zeros (plumbing intact).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

BOX_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def scale_box(boxes: np.ndarray,
              box_range: Tuple[float, ...] = BOX_RANGE) -> np.ndarray:
    """(K, 7) raw -> (K+1, 7) scaled with the ego row prepended as -1
    (nuscenes_layout_dataset.py:153-163)."""
    boxes = np.asarray(boxes, np.float32)
    x_min, y_min, z_min, x_max, y_max, z_max = box_range
    out = np.zeros((boxes.shape[0] + 1, 7), np.float32)
    b = boxes.copy()
    b[:, 0] = (b[:, 0] - x_min) / (x_max - x_min)
    b[:, 1] = (b[:, 1] - y_min) / (y_max - y_min)
    b[:, 2] = (b[:, 2] - z_min) / (z_max - z_min)
    b[:, 3:6] = np.log(np.maximum(b[:, 3:6], 1e-4))
    out[1:, :7] = b[:, :7]
    out[0, :] = -1.0
    return out


def rescale_box(boxes: np.ndarray,
                box_range: Tuple[float, ...] = BOX_RANGE) -> np.ndarray:
    """Inverse of scale_box (:165-172)."""
    x_min, y_min, z_min, x_max, y_max, z_max = box_range
    b = np.asarray(boxes, np.float32).copy()
    b[1:, 0] = b[1:, 0] * (x_max - x_min) + x_min
    b[1:, 1] = b[1:, 1] * (y_max - y_min) + y_min
    b[1:, 2] = b[1:, 2] * (z_max - z_min) + z_min
    b[1:, 3:6] = np.exp(b[1:, 3:6])
    b[0, :] = 0.0
    return b


class NuScenesLayoutDataset:
    """Reads the infos pickle and emits padded-graph batches."""

    def __init__(self, root: str, split: str = "train",
                 vocab_objects: Optional[Sequence[str]] = None,
                 vocab_relations: Optional[Sequence[str]] = None,
                 max_objs: int = 16, max_triples: int = 32,
                 clip_dim: int = 512, with_changes: bool = True,
                 eval_type: Optional[str] = None, seed: int = 0,
                 cache_features: str | bool = "auto",
                 cache_headroom_gb: float = 2.0):
        self.root = root
        self.split = split
        self.max_objs = max_objs
        self.max_triples = max_triples
        self.clip_dim = clip_dim
        # memory-gated CLIP-feature cache (reference FreeMemLinux probe,
        # nuscenes_layout_dataset.py:67): "auto" keeps pickles resident while
        # host RAM headroom stays above cache_headroom_gb.
        self._cache_features = cache_features
        self._cache_headroom_gb = cache_headroom_gb
        self._feat_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        # manipulation augs (nuscenes_layout_dataset.py:263-315): train draws
        # a random type per batch; eval forces eval_type
        self.with_changes = with_changes and split == "train"
        self.eval_type = eval_type
        self._aug_rng = np.random.default_rng(seed)

        pkl = os.path.join(root, f"nuscenes_infos_{split}.pkl")
        with open(pkl, "rb") as f:
            infos = pickle.load(f)
        self.rel, self.objs, self.boxes = {}, {}, {}
        self.scans: List[str] = []
        for i, info in enumerate(infos):
            fid = str(i).zfill(7)
            sg = info["scene_graph"]
            self.scans.append(fid)
            self.rel[fid] = sg["keep_box_relationships"]
            self.objs[fid] = sg["keep_box_names"]
            self.boxes[fid] = sg["keep_box"]

        names = sorted({n for v in self.objs.values() for n in v} | {"ego"})
        self.obj_vocab = {n: i + 1 for i, n in enumerate(
            vocab_objects or names)}  # 0 = padding
        self.rel_vocab = vocab_relations

    def __len__(self):
        return len(self.scans)

    def _cache_ok(self) -> bool:
        if self._cache_features is True:
            return True
        if not self._cache_features:  # False / "" / "off"
            return False
        from ..utils.memory import available_gb
        return available_gb() > self._cache_headroom_gb

    def _load_clip_feats(self, fid: str, n_obj: int, n_tri: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
        hit = self._feat_cache.get(fid)
        if hit is not None:
            return hit
        split_dir = "train" if self.split == "train" else "val"
        path = os.path.join(self.root, split_dir, "CLIP", fid,
                            f"CLIP_{fid}.pkl")
        if os.path.exists(path):
            with open(path, "rb") as f:
                feats = pickle.load(f)
            out = (np.asarray(feats["clip_obj_feats"], np.float32),
                   np.asarray(feats["clip_rel_feats"], np.float32))
            if self._cache_ok():
                self._feat_cache[fid] = out
            return out
        return (np.zeros((n_obj, self.clip_dim), np.float32),
                np.zeros((n_tri, self.clip_dim), np.float32))

    def scene(self, index: int) -> Dict[str, np.ndarray]:
        fid = self.scans[index]
        names = ["ego"] + list(self.objs[fid])
        boxes = scale_box(self.boxes[fid])
        triples = np.asarray(self.rel[fid], np.int64).reshape(-1, 3)
        objs = np.asarray([self.obj_vocab.get(n, 0) for n in names], np.int64)
        tf, rf = self._load_clip_feats(fid, len(objs), len(triples))
        return {"objs": objs, "triples": triples, "boxes": boxes,
                "text_feat": tf, "rel_feat": rf}

    def collate(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """Fixed-capacity padded graph over the selected scenes (the collate_fn
        replacement; see encoders/scene_graph.py for the key contract)."""
        n_sc = len(indices)
        N = n_sc * self.max_objs
        T = n_sc * self.max_triples
        objs = np.zeros((N,), np.int32)
        obj_mask = np.zeros((N,), bool)
        boxes = np.zeros((N, 7), np.float32)
        scene_ids = np.zeros((N,), np.int32)
        triples = np.zeros((T, 3), np.int32)
        pred_mask = np.zeros((T,), bool)
        text = np.zeros((N, self.clip_dim), np.float32)
        rel = np.zeros((T, self.clip_dim), np.float32)

        for s, idx in enumerate(indices):
            sc = self.scene(idx)
            base, tbase = s * self.max_objs, s * self.max_triples
            k = min(len(sc["objs"]), self.max_objs)
            objs[base:base + k] = sc["objs"][:k]
            obj_mask[base:base + k] = True
            boxes[base:base + k] = sc["boxes"][:k]
            text[base:base + k] = sc["text_feat"][:k]
            scene_ids[base:base + self.max_objs] = s
            tt = [t for t in sc["triples"]
                  if t[0] < self.max_objs and t[2] < self.max_objs][
                : self.max_triples]
            for j, t in enumerate(tt):
                triples[tbase + j] = [base + t[0], t[1], base + t[2]]
                pred_mask[tbase + j] = True
                if j < len(sc["rel_feat"]):
                    rel[tbase + j] = sc["rel_feat"][j]

        graph = {
            "enc_objs": objs, "enc_triples": triples, "enc_text_feat": text,
            "enc_rel_feat": rel, "enc_pred_mask": pred_mask,
            "dec_objs": objs, "dec_triples": triples, "dec_text_feat": text,
            "dec_rel_feat": rel, "dec_pred_mask": pred_mask,
            "dec_boxes": boxes, "dec_objs_to_scene": scene_ids,
            "enc_to_dec": np.arange(N, dtype=np.int32),
            "changed_mask": np.zeros((N,), bool),
            "obj_mask": obj_mask, "n_scenes": np.int32(n_sc),
        }
        if self.with_changes or self.eval_type:
            # one manipulation PER SCENE (reference applies with_changes in
            # __getitem__); eval_type forces the mode and switches the
            # relationship change to the interpretable semantic flip
            from .graph_aug import random_manipulation_batched
            graph = random_manipulation_batched(
                graph, self._aug_rng, max_objs=self.max_objs,
                n_scenes=n_sc, mode=self.eval_type)
        return graph
