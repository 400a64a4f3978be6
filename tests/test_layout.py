"""Layout-diffusion stack tests: GCN, scene-graph encoder, UNet1D, full loop."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lidar_layout_tpu.data.layout_synthetic import synthetic_graph_batch
from lidar_layout_tpu.encoders.scene_graph import SceneGraphEncoder
from lidar_layout_tpu.models.layout_diffusion import (LayoutDiffusion,
                                                      LayoutDiffusionConfig,
                                                      angle_to_sincos,
                                                      sincos_to_angle)
from lidar_layout_tpu.models.unet1d import UNet1DConfig, UNet1DModel
from lidar_layout_tpu.nn.graph import GraphTripleConvNet

SMALL_UNET = UNet1DConfig(model_channels=64, num_res_blocks=1,
                          channel_mult=(1, 1), attention_resolutions=(1,),
                          num_heads=4, concat_dim=128, crossattn_dim=128,
                          gconv_dim=16)


def graph(seed=0, **kw):
    g = synthetic_graph_batch(np.random.default_rng(seed), **kw)
    return {k: jnp.asarray(v) for k, v in g.items()}


class TestGraphConv:
    def test_masked_triples_do_not_leak(self):
        gcn = GraphTripleConvNet(input_dim_obj=16, input_dim_pred=16,
                                 num_layers=2, hidden_dim=32)
        rng = np.random.default_rng(0)
        objs = jnp.asarray(rng.standard_normal((6, 16)), jnp.float32)
        preds = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
        edges = jnp.asarray([[0, 1], [1, 2], [3, 4], [4, 5]], jnp.int32)
        mask_all = jnp.asarray([True, True, True, True])
        mask_half = jnp.asarray([True, True, False, False])
        params = gcn.init(jax.random.key(0), objs, preds, edges, mask_all)
        o_all, _ = gcn.apply(params, objs, preds, edges, mask_all)
        o_half, _ = gcn.apply(params, objs, preds, edges, mask_half)
        # nodes 0-2 only touch live triples -> unchanged by masking 2-3
        np.testing.assert_allclose(np.asarray(o_all)[:3], np.asarray(o_half)[:3],
                                   rtol=1e-5, atol=1e-5)
        # nodes 3-5 lose their messages -> must change
        assert np.abs(np.asarray(o_all)[3:] - np.asarray(o_half)[3:]).max() > 1e-4


class TestSceneGraphEncoder:
    def test_shapes_and_untouched_passthrough(self):
        g = graph()
        enc = SceneGraphEncoder(num_objs=32, num_preds=16, embedding_dim=64,
                                replace_latent=False)
        params = enc.init({"params": jax.random.key(0),
                           "change": jax.random.key(1)}, g)
        latent, obj_embed = enc.apply(params, g, rngs={"change": jax.random.key(2)})
        assert latent.shape == (g["dec_objs"].shape[0], enc.out_dim)
        assert obj_embed.shape == latent.shape

    def test_added_nodes_get_manipulated_latent(self):
        g = graph(with_changes=True)
        # mark node 0 as newly added
        e2d = np.asarray(g["enc_to_dec"]).copy()
        e2d[0] = -1
        g["enc_to_dec"] = jnp.asarray(e2d)
        enc = SceneGraphEncoder(num_objs=32, num_preds=16, embedding_dim=64,
                                replace_latent=False)
        params = enc.init({"params": jax.random.key(0),
                           "change": jax.random.key(1)}, g)
        l1, _ = enc.apply(params, g, rngs={"change": jax.random.key(2)})
        assert np.isfinite(np.asarray(l1)).all()


class TestUNet1D:
    def test_forward_shape(self):
        g = graph()
        n = g["dec_objs"].shape[0]
        model = UNet1DModel(SMALL_UNET)
        box_t = jnp.zeros((n, 8))
        obj_embed = jnp.zeros((n, 40))
        t = jnp.zeros((n,), jnp.int32)
        params = model.init(jax.random.key(0), box_t, obj_embed,
                            g["dec_triples"], t)
        out = model.apply(params, box_t, obj_embed, g["dec_triples"], t,
                          pred_mask=g["dec_pred_mask"])
        assert out.shape == (n, 8)


class TestLayoutDiffusion:
    @pytest.fixture(scope="class")
    def model_params(self):
        model = LayoutDiffusion(LayoutDiffusionConfig(timesteps=64), SMALL_UNET,
                                num_objs=32, num_preds=16, sg_embedding_dim=16)
        g = graph()
        params = model.init(jax.random.key(0), g)
        return model, params

    def test_angle_roundtrip(self):
        a = jnp.asarray([[0.3], [-2.0], [3.0]])
        back = sincos_to_angle(angle_to_sincos(a))
        np.testing.assert_allclose(np.asarray(back), np.asarray(a), atol=1e-6)

    def test_per_scene_timesteps_and_loss(self, model_params):
        model, params = model_params
        g = graph(seed=1)
        loss, logs = model.p_losses(params, jax.random.key(1), g)
        assert np.isfinite(float(loss))

    def test_training_overfits_fixed_target(self, model_params):
        """Gradient flow through GCN + UNet1D: a fixed (t, noise) target must be
        drivable to near zero. (The stochastic objective needs thousands of
        steps to move visibly at this scale, so the deterministic overfit is
        the meaningful CI-sized convergence check.)"""
        from lidar_layout_tpu.models.layout_diffusion import angle_to_sincos
        from lidar_layout_tpu.models.schedules import q_sample
        model, params = model_params
        g = graph(seed=2)
        boxes = g["dec_boxes"]
        x_start = jnp.concatenate([boxes[:, :-1],
                                   angle_to_sincos(boxes[:, -1:])], -1)
        t = jnp.full((x_start.shape[0],), 32, jnp.int32)
        noise = jax.random.normal(jax.random.key(7), x_start.shape)
        x_noisy = q_sample(model.schedule, x_start, t, noise)
        rc = jax.random.key(9)

        def loss_fn(p):
            latent, obj_embed = model.encode_graph(p, g, rc)
            out = model.apply_model(p, x_noisy, t, obj_embed, g["dec_triples"],
                                    latent, g.get("dec_pred_mask"))
            return jnp.mean((out - noise) ** 2)

        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, o):
            l, gr = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(gr, o, p)
            return optax.apply_updates(p, up), o, l

        l0 = float(loss_fn(params))
        for _ in range(150):
            params, opt, l = step(params, opt)
        assert float(l) < 0.1 * l0

    def test_ddim_sampling(self, model_params):
        model, params = model_params
        g = graph(seed=3)
        boxes = model.ddim_sample(params, jax.random.key(0), g, steps=8)
        assert boxes.shape == (g["dec_objs"].shape[0], 8)
        assert np.isfinite(np.asarray(boxes)).all()
        out = model.postprocess_boxes(boxes)
        assert out.shape[-1] == 7


class TestGraphManipulation:
    def test_remove_node_marks_added(self):
        from lidar_layout_tpu.data.graph_aug import remove_node
        g = synthetic_graph_batch(np.random.default_rng(0), n_scenes=1)
        node = int(np.flatnonzero(g["obj_mask"])[1])
        g2 = remove_node(g, node)
        assert g2["enc_to_dec"][node] == -1
        tri = g2["enc_triples"]
        touches = (tri[:, 0] == node) | (tri[:, 2] == node)
        assert not (g2["enc_pred_mask"] & touches).any()
        # manipulated graph still feeds the encoder (added-node path live)
        from lidar_layout_tpu.encoders.scene_graph import SceneGraphEncoder
        gj = {k: jnp.asarray(v) for k, v in g2.items()}
        enc = SceneGraphEncoder(num_objs=32, num_preds=16, embedding_dim=16)
        params = enc.init({"params": jax.random.key(0),
                           "change": jax.random.key(1)}, gj)
        latent, _ = enc.apply(params, gj, rngs={"change": jax.random.key(2)})
        assert np.isfinite(np.asarray(latent)).all()

    def test_modify_relationship_flags_endpoints(self):
        from lidar_layout_tpu.data.graph_aug import modify_relationship
        g = synthetic_graph_batch(np.random.default_rng(1), n_scenes=1)
        g2, t = modify_relationship(g, np.random.default_rng(2), 16)
        assert t >= 0
        tri = g2["enc_triples"]
        assert g2["changed_mask"][tri[t, 0]] and g2["changed_mask"][tri[t, 2]]
        assert (g2["enc_triples"][t, 1] != g["enc_triples"][t, 1])


class TestManipulationSemantics:
    """random_manipulation parity (nuscenes_layout_dataset.py:263-315)."""

    def _graph(self, n=6, t=8, max_objs=6):
        rng = np.random.default_rng(0)
        return {
            "enc_triples": np.stack([rng.integers(0, n, t),
                                     rng.integers(0, 9, t),
                                     rng.integers(0, n, t)], 1).astype(np.int32),
            "enc_pred_mask": np.ones(t, bool),
            "enc_to_dec": np.arange(n, dtype=np.int32),
            "changed_mask": np.zeros(n, bool),
            "obj_mask": np.ones(n, bool),
        }

    def test_type_distribution_and_info(self):
        from lidar_layout_tpu.data.graph_aug import random_manipulation

        rng = np.random.default_rng(1)
        types = set()
        for _ in range(60):
            info = {}
            g = random_manipulation(self._graph(), rng, max_objs=6, info=info)
            types.add(info["type"])
            if info["type"] == "addition":
                assert info["added_node_id"] % 6 != 0  # never ego
                assert (g["enc_to_dec"] == -1).sum() == 1
            elif info["type"] == "relationship":
                assert g["changed_mask"].any()
        assert types == {"addition", "relationship", "none"}

    def test_small_graphs_never_manipulated(self):
        from lidar_layout_tpu.data.graph_aug import random_manipulation

        rng = np.random.default_rng(2)
        g0 = self._graph(n=2, t=2, max_objs=2)
        for _ in range(10):
            info = {}
            random_manipulation(g0, rng, max_objs=2, info=info)
            assert info["type"] == "none"

    def test_interpretable_flip(self):
        from lidar_layout_tpu.data.graph_aug import (CHANGED_REL,
                                                     modify_relationship)

        g = self._graph()
        g["enc_triples"][:, 1] = 1  # 'left' everywhere
        g2, t = modify_relationship(g, np.random.default_rng(3),
                                    interpretable=True)
        assert t >= 0
        assert g2["enc_triples"][t, 1] == CHANGED_REL[1]  # left -> right


class TestTrafficDistribution:
    """Structured traffic generator + relation metric (layout north star)."""

    def test_traffic_batch_contract_and_relations(self):
        from lidar_layout_tpu.data.layout_synthetic import (
            CAR, EGO, PED, denormalize_boxes7, normalize_boxes7,
            relation_satisfaction, traffic_graph_batch)

        g = traffic_graph_batch(np.random.default_rng(0), n_scenes=4)
        assert g["dec_boxes"].shape == (32, 7)
        # slot 0 of every scene is ego
        for s in range(4):
            assert g["dec_objs"][s * 8] == EGO
        # every real object is a known class
        assert set(np.unique(g["dec_objs"][g["obj_mask"]])) <= {EGO, CAR, PED}
        # normalization round-trips
        np.testing.assert_allclose(
            normalize_boxes7(denormalize_boxes7(g["dec_boxes"])),
            g["dec_boxes"], atol=1e-6)
        # the data itself satisfies its own graph perfectly
        boxes = denormalize_boxes7(g["dec_boxes"])
        assert relation_satisfaction(boxes, g) == 1.0
        # cars sit on the two lanes at y = +-2
        sel = (g["dec_objs"] == CAR) & g["obj_mask"]
        y = boxes[sel][:, 4]
        assert (np.abs(np.abs(y) - 2.0) < 1.5).all()

    def test_relation_metric_detects_shuffled_boxes(self):
        from lidar_layout_tpu.data.layout_synthetic import (
            denormalize_boxes7, relation_satisfaction, traffic_graph_batch)

        g = traffic_graph_batch(np.random.default_rng(1), n_scenes=8)
        boxes = denormalize_boxes7(g["dec_boxes"])
        rng = np.random.default_rng(2)
        shuffled = boxes.copy()
        shuffled[:, 3:5] = rng.permutation(shuffled[:, 3:5])
        assert relation_satisfaction(shuffled, g) < 0.8

    def test_with_changes_drops_one_enc_node_per_scene(self):
        from lidar_layout_tpu.data.layout_synthetic import (
            added_relation_satisfaction, denormalize_boxes7,
            traffic_graph_batch)

        g = traffic_graph_batch(np.random.default_rng(3), n_scenes=4,
                                with_changes=True)
        added = g["enc_to_dec"] < 0
        # at most one added node per scene, never the ego slot
        for s in range(4):
            sl = slice(s * 8, (s + 1) * 8)
            assert added[sl].sum() <= 1
            assert not added[s * 8]
        # added nodes are real objects, present in the decoder graph
        assert (g["obj_mask"][added]).all()
        assert (g["dec_objs"][added] > 0).all()
        # their enc rows are cleared and their enc triples masked
        assert (g["enc_objs"][added] == 0).all()
        tri = g["enc_triples"]
        touches = added[tri[:, 0]] | added[tri[:, 2]]
        assert not (g["enc_pred_mask"] & touches).any()
        # the dec graph still supervises them (metric ceiling = 1)
        boxes = denormalize_boxes7(g["dec_boxes"])
        if (g["dec_pred_mask"] & (added[tri[:, 0]] | added[tri[:, 2]])).any():
            assert added_relation_satisfaction(boxes, g) == 1.0


class TestBatchedManipulation:
    """Per-scene manipulation of collated graphs (reference applies
    with_changes in __getitem__, i.e. once per scene — a single draw per
    BATCH diluted the supervision by 1/n_scenes)."""

    def _batched_graph(self, n_scenes=4, max_objs=6, rng=None):
        rng = rng or np.random.default_rng(0)
        n = n_scenes * max_objs
        tri = []
        for s in range(n_scenes):
            b = s * max_objs
            tri += [[b, 1, b + 1], [b + 1, 3, b + 2], [b + 2, 2, b + 3]]
        tri = np.asarray(tri, np.int32)
        return {
            "enc_objs": np.ones((n,), np.int32),
            "enc_triples": tri.copy(), "dec_triples": tri.copy(),
            "enc_pred_mask": np.ones((len(tri),), bool),
            "enc_to_dec": np.arange(n, dtype=np.int32),
            "changed_mask": np.zeros((n,), bool),
            "obj_mask": np.ones((n,), bool),
        }

    def test_every_scene_gets_one_manipulation(self):
        from lidar_layout_tpu.data.graph_aug import random_manipulation_batched
        n_scenes, max_objs = 4, 6
        infos = []
        g = random_manipulation_batched(
            self._batched_graph(n_scenes, max_objs),
            np.random.default_rng(1), max_objs=max_objs, n_scenes=n_scenes,
            mode="addition", infos=infos)
        assert len(infos) == n_scenes
        removed = np.flatnonzero(g["enc_to_dec"] == -1)
        assert len(removed) == n_scenes  # one per scene, not one per batch
        scenes_hit = sorted(set(int(r) // max_objs for r in removed))
        assert scenes_hit == list(range(n_scenes))
        assert all(int(r) % max_objs != 0 for r in removed)  # ego preserved

    def test_forced_relationship_uses_interpretable_flip(self):
        from lidar_layout_tpu.data.graph_aug import (CHANGED_REL,
                                                     random_manipulation_batched)
        n_scenes, max_objs = 3, 6
        g0 = self._batched_graph(n_scenes, max_objs)
        g = random_manipulation_batched(
            g0, np.random.default_rng(2), max_objs=max_objs,
            n_scenes=n_scenes, mode="relationship")
        changed = np.flatnonzero(
            g["enc_triples"][:, 1] != g0["dec_triples"][:, 1])
        assert len(changed) == n_scenes
        for t in changed:
            old = int(g0["dec_triples"][t, 1])
            assert int(g["enc_triples"][t, 1]) == CHANGED_REL[old]
            # the changed triple stays inside its own scene's slots
            s = int(g["enc_triples"][t, 0]) // max_objs
            assert int(g["enc_triples"][t, 2]) // max_objs == s
