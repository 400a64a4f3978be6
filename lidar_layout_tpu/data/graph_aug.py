"""Scene-graph manipulation augmentations for layout training.

Parity: ``lidm/data/nuscenes_layout_dataset.py`` —
``remove_node_and_relationship`` (:337), ``modify_relship`` (:388), and the
``with_changes`` branch (:263-315): per scene one of {'addition',
'relationship', 'none'} is drawn (uniform; forced to 'none' for graphs with
<=2 objects); the encoder sees the *modified* graph while the decoder
supervises the original, with touched nodes flagged — this trains the
SceneGraphEncoder's manipulation branch.

Fixed-shape formulation: instead of physically removing rows, the encoder view
masks the removed node's predicates and the ``enc_to_dec`` map marks it as
"added" (-1) so the decoder must reconstruct it; changed relationships flip
``changed_mask`` on their endpoints.

The relationship vocabulary (reference :396-399, index -> label):
  0 none | 1 left | 2 right | 3 front | 4 behind | 5 close by | 6 above
  | 7 standing on | 8 bigger than | 9 smaller than | 10 taller than
  | 11 shorter than | 12 symmetrical to | 13 same style as
  | 14 same super category as | 15 same material as
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

# changed_relationships_dict (reference :12-28) as index pairs: the
# "interpretable" flip used at eval time (left<->right, front<->behind, ...)
CHANGED_REL = {0: 0, 1: 2, 2: 1, 3: 4, 4: 3, 5: 5, 6: 6, 7: 7,
               8: 9, 9: 8, 10: 11, 11: 10, 12: 12, 13: 13, 14: 14, 15: 15}
# subset evaluatable via geometric constraints (reference :401)
INTERPRETABLE_RELS = (0, 1, 2, 3, 5, 6, 7, 8)


def remove_node(graph: Dict[str, np.ndarray], node: int
                ) -> Dict[str, np.ndarray]:
    """Hide one decoder node from the encoder view — the 'addition'
    manipulation (reference :337-386)."""
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
                        num_preds: int = 16, interpretable: bool = False,
                        node_range: Optional[Tuple[int, int]] = None
                        ) -> Tuple[Dict[str, np.ndarray], int]:
    """Change one live predicate in the encoder view; flag its endpoints
    (reference :388-441).

    ``interpretable=True`` (the eval mode) restricts to spatially
    interpretable predicates and applies the semantic opposite
    (left->right, bigger->smaller, ...); otherwise a random different
    predicate in [0, 9) (reference :422). ``node_range=(lo, hi)`` restricts
    the candidate triples to one scene's slots in a batched graph."""
    g = {k: (v.copy() if isinstance(v, np.ndarray) else v)
         for k, v in graph.items()}
    live = np.flatnonzero(np.asarray(g["enc_pred_mask"]))
    if node_range is not None:
        lo, hi = node_range
        tri = np.asarray(g["enc_triples"])
        live = [t for t in live if lo <= int(tri[t, 0]) < hi
                and lo <= int(tri[t, 2]) < hi]
    if interpretable:
        tri = np.asarray(g["enc_triples"])
        live = [t for t in live if int(tri[t, 1]) in INTERPRETABLE_RELS]
    if len(live) == 0:
        return g, -1
    t = int(rng.choice(live))
    tri = g["enc_triples"].copy()
    old = int(tri[t, 1])
    if interpretable:
        new = CHANGED_REL.get(old, old)
        if new == old and old not in (5, 6, 7, 0):  # self-mapped spatials ok
            return g, -1
    else:
        new = (old + int(rng.integers(1, min(num_preds, 9)))) % min(num_preds, 9)
    tri[t, 1] = new
    g["enc_triples"] = tri
    ch = g["changed_mask"].copy()
    ch[tri[t, 0]] = True
    ch[tri[t, 2]] = True
    g["changed_mask"] = ch
    return g, t


def random_manipulation(graph: Dict[str, np.ndarray],
                        rng: np.random.Generator, num_preds: int = 16,
                        p_remove: float = 0.5,
                        max_objs: int = 0,
                        mode: Optional[str] = None,
                        info: Optional[dict] = None,
                        scene: Optional[Tuple[int, int]] = None,
                        interpretable: bool = False
                        ) -> Dict[str, np.ndarray]:
    """One manipulation per call (the with_changes branch, reference
    :263-315): type in {'addition', 'relationship', 'none'} — uniform when
    ``mode`` is None (training), or forced (eval's eval_type, which also
    switches the relationship change to the interpretable semantic flip).
    Graphs with <=2 valid objects are never manipulated.

    ``max_objs`` is the per-scene slot count for batched graphs: every scene's
    slot 0 is its 'ego' row and is never removed (the reference excludes ego by
    class, nuscenes_layout_dataset.py:347). 0 means a single-scene graph.
    ``scene=(lo, hi)`` restricts the draw to one scene's slots — the reference
    manipulates once PER SCENE (its __getitem__), not once per batch; use
    :func:`random_manipulation_batched` on collated graphs.
    ``info`` (optional dict) is filled with {'type', 'added_node_id',
    'changed_triple'} — the reference's output['manipulate'] record."""
    if info is None:
        info = {}
    valid_nodes = np.flatnonzero(np.asarray(graph["obj_mask"]))
    if scene is not None:
        lo, hi = scene
        valid_nodes = valid_nodes[(valid_nodes >= lo) & (valid_nodes < hi)]
    if mode is None:
        mode = ["relationship", "addition", "none"][int(rng.integers(3))]
    if len(valid_nodes) <= 2:  # per-scene guard when scene is given
        mode = "none"

    if mode == "addition":
        # never remove any scene's ego row (slot 0 of each max_objs block)
        stride = max_objs if max_objs > 0 else len(graph["obj_mask"])
        candidates = [int(n) for n in valid_nodes if n % stride != 0]
        if candidates:
            node = int(rng.choice(candidates))
            info.update(type="addition", added_node_id=node)
            return remove_node(graph, node)
        mode = "none"
    if mode == "relationship":
        g, t = modify_relationship(graph, rng, num_preds,
                                   interpretable=interpretable,
                                   node_range=scene)
        if t >= 0:
            info.update(type="relationship", changed_triple=t)
            return g
        mode = "none"
    info.update(type="none")
    return graph


def random_manipulation_batched(graph: Dict[str, np.ndarray],
                                rng: np.random.Generator,
                                max_objs: int, n_scenes: int,
                                num_preds: int = 16,
                                mode: Optional[str] = None,
                                interpretable: Optional[bool] = None,
                                infos: Optional[list] = None
                                ) -> Dict[str, np.ndarray]:
    """One manipulation PER SCENE of a collated multi-scene graph (reference
    applies with_changes in __getitem__, i.e. per scene). ``interpretable``
    defaults to "eval semantics iff mode is forced" — the reference's
    eval_type path flips predicates to their semantic opposites."""
    if interpretable is None:
        interpretable = mode is not None
    for s in range(n_scenes):
        info: dict = {}
        graph = random_manipulation(
            graph, rng, num_preds=num_preds, max_objs=max_objs, mode=mode,
            info=info, scene=(s * max_objs, (s + 1) * max_objs),
            interpretable=interpretable)
        if infos is not None:
            infos.append(info)
    return graph
