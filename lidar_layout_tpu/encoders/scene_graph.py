"""Scene-graph conditioning encoder for layout diffusion.

Parity: ``lidm/modules/encoders/scene_graph.py:6-149`` — object/predicate
embeddings (+512-dim CLIP text features concatenated), a 5-layer GraphTripleConv
encoder, and a manipulation GCN that re-encodes graphs with added/changed nodes
(zero latent + noise change-flag for touched nodes, original latents kept for
untouched ones).

TPU-first re-expression of the ragged node insertion (reference lines 118-147):
instead of list-concatenating zero rows at python time, the caller provides a
fixed-capacity decoder graph plus ``enc_to_dec`` (index of each decoder node in
the encoder graph, -1 for newly added nodes) and ``changed_mask``. The gather +
where-select reproduces the same semantics with static shapes.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.graph import GraphTripleConvNet

Array = jax.Array


class SceneGraphEncoder(nn.Module):
    num_objs: int
    num_preds: int
    embedding_dim: int = 128
    gconv_num_layers: int = 5
    use_clip: bool = True
    clip_dim: int = 512
    residual: bool = False
    replace_latent: bool = False

    @property
    def out_dim(self) -> int:
        add = self.clip_dim if self.use_clip else 0
        return self.embedding_dim * 2 + add

    @nn.compact
    def __call__(self, graph: Dict[str, Array], rng: Optional[Array] = None
                 ) -> Tuple[Array, Array]:
        """graph keys (all fixed-capacity, batched graphs flattened):
          enc_objs (N,) int, enc_triples (T, 3) int [s, p, o],
          enc_text_feat (N, 512), enc_rel_feat (T, 512),
          enc_pred_mask (T,) bool,
          dec_objs (M,), dec_triples (U, 3), dec_text_feat, dec_rel_feat,
          dec_pred_mask (U,) bool,
          enc_to_dec (M,) int  — encoder-node index per decoder node, -1 = added,
          changed_mask (M,) bool — manipulated nodes.
        Returns (latent_obj_vecs (M, out_dim), obj_embed (M, out_dim))."""
        gdim = self.embedding_dim
        add = self.clip_dim if self.use_clip else 0
        out_dim = self.out_dim

        obj_emb_ec = nn.Embed(self.num_objs + 1, gdim * 2, name="obj_embeddings_ec")
        pred_emb_ec = nn.Embed(self.num_preds, gdim * 2, name="pred_embeddings_ec")
        pred_emb_man = nn.Embed(self.num_preds, gdim * 2,
                                name="pred_embeddings_man_dc")

        gconv_ec = GraphTripleConvNet(
            input_dim_obj=gdim * 2 + add, input_dim_pred=gdim * 2 + add,
            hidden_dim=gdim * 4, num_layers=self.gconv_num_layers,
            residual=self.residual, output_dim=out_dim, name="gconv_net_ec")
        gconv_man = GraphTripleConvNet(
            input_dim_obj=out_dim + gdim + gdim * 2 + add,
            input_dim_pred=gdim * 2 + add,
            hidden_dim=gdim * 4, num_layers=min(self.gconv_num_layers, 5),
            residual=self.residual, output_dim=out_dim,
            name="gconv_net_manipulation")

        # ---- encoder pass over the original graph (scene_graph.py:80-94) ----
        e_s, e_p, e_o = (graph["enc_triples"][:, 0], graph["enc_triples"][:, 1],
                         graph["enc_triples"][:, 2])
        edges = jnp.stack([e_s, e_o], axis=1)
        obj_embed = obj_emb_ec(graph["enc_objs"])
        pred_embed = pred_emb_ec(e_p)
        if self.use_clip:
            obj_embed = jnp.concatenate([graph["enc_text_feat"], obj_embed], -1)
            pred_embed = jnp.concatenate([graph["enc_rel_feat"], pred_embed], -1)
        latent_obj, _latent_pred = gconv_ec(obj_embed, pred_embed, edges,
                                            graph.get("enc_pred_mask"))

        # ---- align to the decoder graph; zero rows for added nodes ----------
        e2d = graph["enc_to_dec"]
        added = e2d < 0
        latent_aligned = jnp.where(added[:, None], 0.0,
                                   latent_obj[jnp.clip(e2d, 0, None)])

        # change flags: N(0,1) noise for added/changed nodes, zeros otherwise
        touched = added | graph["changed_mask"].astype(bool)
        if rng is None:
            rng = self.make_rng("change") if self.has_rng("change") else None
        noise = (jax.random.normal(rng, (latent_aligned.shape[0], gdim))
                 if rng is not None else jnp.zeros((latent_aligned.shape[0], gdim)))
        change_repr = jnp.where(touched[:, None], noise, 0.0)

        # ---- manipulation pass over the decoder graph (lines 96-139) --------
        d_s, d_p, d_o = (graph["dec_triples"][:, 0], graph["dec_triples"][:, 1],
                         graph["dec_triples"][:, 2])
        dec_edges = jnp.stack([d_s, d_o], axis=1)
        obj_embed_d = obj_emb_ec(graph["dec_objs"])
        pred_embed_d = pred_emb_man(d_p)
        if self.use_clip:
            obj_embed_d = jnp.concatenate([graph["dec_text_feat"], obj_embed_d], -1)
            pred_embed_d = jnp.concatenate([graph["dec_rel_feat"], pred_embed_d], -1)

        man_in = jnp.concatenate([latent_aligned, change_repr, obj_embed_d], -1)
        latent_man, _ = gconv_man(man_in, pred_embed_d, dec_edges,
                                  graph.get("dec_pred_mask"))

        if self.replace_latent:
            latent_out = latent_man
        else:
            # keep original latents for untouched nodes (lines 141-145)
            latent_out = jnp.where(touched[:, None], latent_man, latent_aligned)
        return latent_out, obj_embed_d
