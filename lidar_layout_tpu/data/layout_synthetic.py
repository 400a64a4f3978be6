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


# --------------------------------------------------------------------------
# Structured "traffic" distribution for learning-evidence runs
# --------------------------------------------------------------------------

# class vocabulary (0 = padding)
EGO, CAR, PED = 1, 2, 3
# predicate vocabulary (0 = padding)
FRONT_OF, BEHIND, LEFT_OF_EGO, RIGHT_OF_EGO = 1, 2, 3, 4

# normalization ranges: boxes enter diffusion roughly in [-1, 1]
SIZE_SCALE = 6.0   # sizes in [0, 6] m
XY_SCALE = 35.0    # |x|,|y| <= 35 m
Z_SCALE = 3.0      # |z| <= 3 m
_NORM = np.array([SIZE_SCALE] * 3 + [XY_SCALE, XY_SCALE, Z_SCALE],
                 np.float32)


def normalize_boxes7(boxes: np.ndarray) -> np.ndarray:
    out = boxes.copy()
    out[..., :6] = boxes[..., :6] / _NORM
    return out


def denormalize_boxes7(boxes: np.ndarray) -> np.ndarray:
    out = np.asarray(boxes).copy()
    out[..., :6] = out[..., :6] * _NORM
    return out


def traffic_graph_batch(rng: np.random.Generator, n_scenes: int = 8,
                        max_objs_per_scene: int = 8,
                        max_triples_per_scene: int = 12,
                        clip_dim: int = 512,
                        with_changes: bool = False) -> Dict[str, np.ndarray]:
    """Structured traffic scenes: a *learnable* layout distribution.

    Each scene: ego at the origin (slot 0); 2-5 cars on two lanes at
    y = ±2 m heading ±x; 0-2 pedestrians on the sidewalks (|y| ≈ 5-8 m).
    Scene-graph triples encode true geometric relations — (a FRONT_OF b)
    for same-lane car pairs, (p LEFT/RIGHT_OF_EGO ego) for pedestrians —
    so a trained conditional model must place boxes consistently with the
    graph; relation-satisfaction of samples is a direct learning metric.
    Boxes are normalized (normalize_boxes7) to diffusion scale; class
    text features are deterministic per-class unit vectors (stand-in for
    the CLIP cache the reference precomputes,
    nuscenes_layout_dataset.py:239-268).
    """
    N = n_scenes * max_objs_per_scene
    T = n_scenes * max_triples_per_scene

    objs = np.zeros((N,), np.int32)
    obj_mask = np.zeros((N,), bool)
    boxes = np.zeros((N, 7), np.float32)
    scene_ids = np.zeros((N,), np.int32)
    triples = np.zeros((T, 3), np.int32)
    pred_mask = np.zeros((T,), bool)

    # deterministic per-class / per-predicate feature vectors
    feat_of = {c: np.random.default_rng(1000 + c).standard_normal(
        clip_dim).astype(np.float32) / np.sqrt(clip_dim)
        for c in (0, EGO, CAR, PED)}
    pfeat_of = {p: np.random.default_rng(2000 + p).standard_normal(
        clip_dim).astype(np.float32) / np.sqrt(clip_dim)
        for p in (0, FRONT_OF, BEHIND, LEFT_OF_EGO, RIGHT_OF_EGO)}

    for s in range(n_scenes):
        base = s * max_objs_per_scene
        scene_ids[base:base + max_objs_per_scene] = s

        # slot 0: ego
        objs[base] = EGO
        obj_mask[base] = True
        boxes[base] = [4.5, 1.9, 1.7, 0.0, 0.0, -1.0, 0.0]

        slots = []  # (slot, cls, x, y, lane)
        n_cars = int(rng.integers(2, min(6, max_objs_per_scene - 2) + 1))
        for i in range(n_cars):
            lane = int(rng.integers(0, 2))           # 0: y=-2 ->, 1: y=+2 <-
            x = float(rng.uniform(-30, 30))
            y = (-2.0 if lane == 0 else 2.0) + float(rng.normal(0, 0.3))
            yaw = (0.0 if lane == 0 else np.pi) + float(rng.normal(0, 0.1))
            size = np.array([4.5, 1.9, 1.7]) * (1 + rng.normal(0, 0.05, 3))
            k = base + 1 + i
            objs[k] = CAR
            obj_mask[k] = True
            boxes[k] = [*size, x, y, -1.0 + float(rng.normal(0, 0.1)), yaw]
            slots.append((k, CAR, x, y, lane))

        n_ped = int(rng.integers(0, min(3, max_objs_per_scene - 1 - n_cars)
                                 + 1))
        for j in range(n_ped):
            side = 1 if rng.uniform() < 0.5 else -1
            x = float(rng.uniform(-20, 20))
            y = side * float(rng.uniform(5, 8))
            k = base + 1 + n_cars + j
            objs[k] = PED
            obj_mask[k] = True
            boxes[k] = [0.6, 0.6, 1.7, x, y, -0.8,
                        float(rng.uniform(-np.pi, np.pi))]
            slots.append((k, PED, x, y, None))

        # triples: same-lane car ordering + pedestrian side-of-ego
        tbase = s * max_triples_per_scene
        tri = []
        cars = [t for t in slots if t[1] == CAR]
        for ai in range(len(cars)):
            for bi in range(ai + 1, len(cars)):
                ka, _, xa, _, la = cars[ai]
                kb, _, xb, _, lb = cars[bi]
                if la != lb:
                    continue
                if xa > xb:
                    tri.append((ka, FRONT_OF, kb))
                else:
                    tri.append((kb, FRONT_OF, ka))
        for (k, c, x, y, _) in slots:
            if c == PED:
                tri.append((k, LEFT_OF_EGO if y > 0 else RIGHT_OF_EGO, base))
        rng.shuffle(tri)
        for j, (a, p, b) in enumerate(tri[:max_triples_per_scene]):
            triples[tbase + j] = [a, p, b]
            pred_mask[tbase + j] = True

    boxes = normalize_boxes7(boxes)
    text_feat = np.stack([feat_of[int(c)] for c in objs])
    rel_feat = np.stack([pfeat_of[int(p)] for p in triples[:, 1]])

    # manipulation supervision (reference with_changes, nuscenes_layout_
    # dataset.py:330-360 'addition' mode): the ENCODER graph omits one
    # random non-ego node per scene (enc_to_dec = -1, its triples masked)
    # while the decoder graph — and the box loss — keep it, so the model
    # learns to place an *added* node from its graph relations alone.
    enc_to_dec = np.arange(N, dtype=np.int32)
    enc_pred_mask = pred_mask.copy()
    added_mask = np.zeros((N,), bool)
    if with_changes:
        for s in range(n_scenes):
            base = s * max_objs_per_scene
            cand = [k for k in range(base + 1, base + max_objs_per_scene)
                    if obj_mask[k]]
            if not cand:
                continue
            k = int(rng.choice(cand))
            enc_to_dec[k] = -1
            added_mask[k] = True
            touches = (triples[:, 0] == k) | (triples[:, 2] == k)
            enc_pred_mask &= ~touches

    return {
        "enc_objs": np.where(added_mask, 0, objs).astype(np.int32),
        "enc_triples": triples, "enc_text_feat": text_feat,
        "enc_rel_feat": rel_feat, "enc_pred_mask": enc_pred_mask,
        "dec_objs": objs, "dec_triples": triples, "dec_text_feat": text_feat,
        "dec_rel_feat": rel_feat, "dec_pred_mask": pred_mask,
        "dec_boxes": boxes, "dec_objs_to_scene": scene_ids,
        "enc_to_dec": enc_to_dec,
        "changed_mask": np.zeros((N,), bool),
        "added_mask": added_mask,
        "obj_mask": obj_mask, "n_scenes": np.int32(n_scenes),
    }


def relation_satisfaction(boxes7: np.ndarray, graph: Dict[str, np.ndarray]
                          ) -> float:
    """Fraction of real triples whose geometric relation holds in ``boxes7``
    (denormalized (N,7)). The learning metric for the layout north star."""
    tri = graph["dec_triples"]
    ok, total = 0, 0
    for (a, p, b), valid in zip(tri, graph["dec_pred_mask"]):
        if not valid:
            continue
        xa, ya = boxes7[a, 3], boxes7[a, 4]
        xb = boxes7[b, 3]
        if p == FRONT_OF:
            ok += int(xa > xb)
        elif p == BEHIND:
            ok += int(xa < xb)
        elif p == LEFT_OF_EGO:
            ok += int(ya > 0)
        elif p == RIGHT_OF_EGO:
            ok += int(ya < 0)
        else:
            continue
        total += 1
    return ok / max(total, 1)


def added_relation_satisfaction(boxes7: np.ndarray,
                                graph: Dict[str, np.ndarray]) -> float:
    """relation_satisfaction restricted to triples that involve an ADDED node
    (enc_to_dec == -1): the manipulation metric — did the model place the
    node it had to synthesize consistently with the requested relations?"""
    added = graph["enc_to_dec"] < 0
    tri = graph["dec_triples"]
    keep = graph["dec_pred_mask"] & (added[tri[:, 0]] | added[tri[:, 2]])
    sub = {"dec_triples": tri, "dec_pred_mask": keep}
    return relation_satisfaction(boxes7, sub)
