"""Scene-graph manipulation augmentations for layout training.

Parity: ``lidm/data/nuscenes_layout_dataset.py`` — ``remove_node_and_relationship``
(:337) and ``modify_relship`` (:388): the encoder sees a *modified* graph while
the decoder supervises the original, with the touched nodes flagged — this is
what trains the SceneGraphEncoder's manipulation branch.

Fixed-shape formulation: instead of physically removing rows, the encoder view
masks the removed node's predicates and the ``enc_to_dec`` map marks it as
"added" (-1) so the decoder must reconstruct it; changed relationships flip
``changed_mask`` on their endpoints.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def remove_node(graph: Dict[str, np.ndarray], node: int
                ) -> Dict[str, np.ndarray]:
    """Hide one decoder node from the encoder view (reference :337-386)."""
    g = {k: (v.copy() if isinstance(v, np.ndarray) else v)
         for k, v in graph.items()}
    # encoder no longer sees the node: mask its triples, mark it added
    tri = g["enc_triples"]
    touches = (tri[:, 0] == node) | (tri[:, 2] == node)
    g["enc_pred_mask"] = g["enc_pred_mask"] & ~touches
    e2d = g["enc_to_dec"].copy()
    e2d[node] = -1
    g["enc_to_dec"] = e2d
    return g


def modify_relationship(graph: Dict[str, np.ndarray], rng: np.random.Generator,
                        num_preds: int) -> Tuple[Dict[str, np.ndarray], int]:
    """Change one live predicate in the encoder view; flag its endpoints
    (reference :388-441)."""
    g = {k: (v.copy() if isinstance(v, np.ndarray) else v)
         for k, v in graph.items()}
    live = np.flatnonzero(np.asarray(g["enc_pred_mask"]))
    if len(live) == 0:
        return g, -1
    t = int(rng.choice(live))
    tri = g["enc_triples"].copy()
    old = tri[t, 1]
    tri[t, 1] = (old + int(rng.integers(1, num_preds))) % num_preds
    g["enc_triples"] = tri
    ch = g["changed_mask"].copy()
    ch[tri[t, 0]] = True
    ch[tri[t, 2]] = True
    g["changed_mask"] = ch
    return g, t


def random_manipulation(graph: Dict[str, np.ndarray],
                        rng: np.random.Generator, num_preds: int = 16,
                        p_remove: float = 0.5,
                        max_objs: int = 0) -> Dict[str, np.ndarray]:
    """One random manipulation per call (the reference applies one per scene
    when with_changes=True).

    ``max_objs`` is the per-scene slot count for batched graphs: every scene's
    slot 0 is its 'ego' row and is never removed (the reference excludes ego by
    class, nuscenes_layout_dataset.py:347). 0 means a single-scene graph.
    """
    valid_nodes = np.flatnonzero(np.asarray(graph["obj_mask"]))
    if len(valid_nodes) > 1 and rng.random() < p_remove:
        # never remove any scene's ego row (slot 0 of each max_objs block)
        stride = max_objs if max_objs > 0 else len(graph["obj_mask"])
        candidates = [int(n) for n in valid_nodes if n % stride != 0]
        if candidates:
            return remove_node(graph, int(rng.choice(candidates)))
    g, _ = modify_relationship(graph, rng, num_preds)
    return g
