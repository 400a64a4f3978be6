#!/usr/bin/env python
"""Train a range-image autoencoder or latent-diffusion model from a YAML config.

CLI parity with the reference's ``main.py`` / ``scripts/train_lidm.py``:
  -b/--base config.yaml   -t/--train   -r/--resume dir   -d/--data-root
  -s/--seed   --steps N   --workdir DIR   --synthetic (force synthetic data)

One process drives all local devices (SPMD); there is no DDP launcher.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", required=True, help="YAML config")
    p.add_argument("-t", "--train", action="store_true")
    p.add_argument("-r", "--resume", default=None)
    p.add_argument("-d", "--data-root", default=None)
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--workdir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (fast local smoke runs)")
    p.add_argument("--bf16", action="store_true")
    # trailing a.b.c=value items = dotlist overrides (main.py:537-539)
    args, unknown = p.parse_known_args()
    bad = [u for u in unknown if "=" not in u]
    if bad:
        p.error(f"unrecognized arguments: {' '.join(bad)}")
    args.overrides = unknown
    return args


def main():
    args = parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.config import instantiate_from_config, load_yaml
    from lidar_layout_tpu.data.datasets import RangeImageDataset
    from lidar_layout_tpu.losses.discriminator import LiDARNLayerDiscriminator
    from lidar_layout_tpu.losses.geometric import GeoConverter
    from lidar_layout_tpu.ops.lidar import LidarGeometry
    from lidar_layout_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from lidar_layout_tpu.train.lr_schedule import (lambda_warmup_cosine_optax,
                                                    scale_lr)
    from lidar_layout_tpu.train.trainer import (BestCheckpointSaver,
                                                CheckpointSaver,
                                                InformationWriter,
                                                IterationTimer, Trainer,
                                                ValidationHook)

    cfg = load_yaml(args.base)
    # -r logdir config re-merge (main.py:502-518): a resumed run reloads the
    # config it was launched with; the -b file acts as an override on top.
    if args.resume:
        saved = os.path.join(args.resume, "config.yaml")
        if os.path.isfile(saved):
            base_cfg = load_yaml(saved)
            def merge(dst, src):
                for k, v in src.items():
                    if isinstance(v, dict) and isinstance(dst.get(k), dict):
                        merge(dst[k], v)
                    else:
                        dst[k] = v
            merge(base_cfg, cfg)
            cfg = base_cfg
            print(f"re-merged config from {saved}")
    if args.overrides:
        from lidar_layout_tpu.config import apply_dotlist
        apply_dotlist(cfg, args.overrides)
        print(f"dotlist overrides: {args.overrides}")
    model_cfg = cfg["model"]
    data_cfg = cfg.get("data", {}).get("params", {})
    dset_cfg = data_cfg.get("dataset", {})
    name = os.path.splitext(os.path.basename(args.base))[0]
    workdir = args.workdir or f"./runs/{name}"

    geom = LidarGeometry(
        size=tuple(dset_cfg.get("size", (64, 1024))),
        fov=tuple(dset_cfg.get("fov", (3, -25))),
        depth_range=tuple(dset_cfg.get("depth_range", (1.0, 56.0))),
        depth_scale=dset_cfg.get("depth_scale", 5.84),
        log_scale=dset_cfg.get("log_scale", True))

    batch_size = data_cfg.get("batch_size", 4)
    accumulate = int(data_cfg.get("accumulate_grad_batches", 1))
    n_dev = len(jax.devices())
    batch_size = max(batch_size, n_dev)  # at least one sample per chip

    def make_raw_batches(split: str, seed: int):
        blk = data_cfg.get(split) or data_cfg.get("train")
        if blk and blk.get("target"):
            from lidar_layout_tpu.data.factory import build_batches
            params = dict(blk.get("params", {}))
            params.setdefault("split", split if split != "validation"
                              else "val")
            return build_batches(
                blk["target"], params, dset_cfg, args.data_root, batch_size,
                seed=seed, force_synthetic=args.synthetic)
        ds = RangeImageDataset(None if args.synthetic else args.data_root,
                               batch_size=batch_size, geom=geom, seed=seed)
        return ds.batches()

    raw_batches = make_raw_batches("train", args.seed)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    target = model_cfg["target"]
    base_lr = model_cfg.get("base_learning_rate", 4.5e-6)
    lr = scale_lr(base_lr, batch_size, 1, accumulate)
    sched_cfg = model_cfg.get("scheduler_config") or \
        model_cfg["params"].get("scheduler_config")
    if sched_cfg:  # use_scheduler path (main.py:712-722, ddpm.py:1378-1398)
        sp = sched_cfg.get("params", sched_cfg)

        def scalar(key, default, alt=None):
            v = sp.get(key, sp.get(alt) if alt else None)
            if isinstance(v, (list, tuple)):  # LambdaLinearScheduler lists
                v = v[0] if v else None
            return default if v is None else float(v)

        lr = lambda_warmup_cosine_optax(
            lr, warm_up_steps=int(scalar("warm_up_steps", 1000)),
            lr_min=scalar("f_min", 0.0, "lr_min"),
            lr_max=scalar("f_max", 1.0, "lr_max"),
            lr_start=scalar("f_start", 1e-6, "lr_start"),
            max_decay_steps=int(scalar("cycle_lengths", args.steps)))
    mesh = make_mesh()

    # ---- held-out validation batches (a fixed, finite slice per pass) ----
    val_every = max(int(data_cfg.get("val_every_steps", args.steps // 10 or 1)), 1)
    n_val_batches = int(data_cfg.get("num_val_batches", 4))
    _val_iter = make_raw_batches("validation", args.seed + 1000)
    val_cache = [shard_batch(dict(next(_val_iter)), mesh)
                 for _ in range(n_val_batches)]

    def val_batches_factory():
        return iter(val_cache)

    sample_every = int(data_cfg.get("sample_every_steps",
                                    max(args.steps // 5, 1)))
    render_fn = None

    model = instantiate_from_config(model_cfg, dtype=dtype)
    from lidar_layout_tpu.models.autoencoder import VQModel
    from lidar_layout_tpu.models.autoencoder_gaus import VQModelGaus
    from lidar_layout_tpu.models.diffusion import LatentDiffusion

    if isinstance(model, VQModel) and not isinstance(model, VQModelGaus):
        from lidar_layout_tpu.train.ae_trainer import (create_ae_state,
                                                       make_ae_optimizers,
                                                       make_ae_train_step,
                                                       make_ae_val_step)
        lc = model_cfg["params"].get("lossconfig")
        if isinstance(lc, dict) and lc.get("target") not in (None, "torch.nn.Identity"):
            loss_cfg = instantiate_from_config(lc)
        else:
            from lidar_layout_tpu.losses.vq_loss import VQLossConfig
            loss_cfg = VQLossConfig()
        geo = GeoConverter(geom, curve_length=loss_cfg.curve_length)
        disc = LiDARNLayerDiscriminator()
        perceptual_fn = None
        if getattr(loss_cfg, "perceptual_factor", 0) > 0:
            # rangenet LPIPS term (vqperceptual.py perceptual_weight); loads
            # converted torch weights from --weights-root when present,
            # otherwise a fixed random feature net (loudly noted)
            from lidar_layout_tpu.losses.perceptual import make_perceptual_fn
            perceptual_fn = make_perceptual_fn(geom)
            print("perceptual loss active "
                  f"(factor={loss_cfg.perceptual_factor})")
        tx_g, tx_d = make_ae_optimizers(lr, lr, accumulate)
        state = create_ae_state(model, disc, jax.random.key(args.seed),
                                (*geom.size, model.cfg.in_channels),
                                tx_g, tx_d, loss_cfg, geo)
        step = make_ae_train_step(model, disc, loss_cfg, geo, tx_g, tx_d,
                                  perceptual_fn=perceptual_fn)
        val_step = make_ae_val_step(model, loss_cfg, geo,
                                    perceptual_fn=perceptual_fn)
        monitor = "val/rec_loss"

        def render_fn(state, rng):  # ImageLogger: inputs + reconstructions
            x = val_cache[0]["image"]
            dec, _, _ = model.apply(state.params_g, x)
            return {"inputs": x, "reconstructions": dec[..., :1]}
    elif isinstance(model, LatentDiffusion):
        from lidar_layout_tpu.train.diffusion_trainer import (
            create_train_state, make_optimizer, make_train_step,
            make_val_step)
        tx = make_optimizer(lr, accumulate=accumulate)
        # conditional configs (layout/sem-map/camera): the cond-stage params
        # only exist if init sees an example of the conditioning input
        cond_ex = val_cache[0].get("cond")
        params = model.init(jax.random.key(args.seed),
                            image_shape=(*geom.size, 1),
                            cond_example=None if cond_ex is None
                            else jnp.asarray(cond_ex[:1]))
        fsc = model_cfg["params"].get("first_stage_config")
        fs_ckpt = (fsc or {}).get("params", {}).get("ckpt_path") \
            if isinstance(fsc, dict) else None
        if fs_ckpt and model.first_stage is not None:
            from lidar_layout_tpu.train.checkpoint import \
                load_first_stage_params
            params["first_stage"] = load_first_stage_params(
                fs_ckpt, params["first_stage"])
            print(f"first_stage weights <- {fs_ckpt}")
        if getattr(model.cfg, "scale_by_std", False):
            from lidar_layout_tpu.models.diffusion import apply_scale_by_std
            s = apply_scale_by_std(model, params, val_cache[0]["image"])
            print(f"scale_by_std: scale_factor={s:.4f}")
        state = create_train_state(model, params, tx)
        step = make_train_step(model, tx)
        val_step = make_val_step(model)
        monitor = "val/loss_simple_ema"

        if hasattr(model, "decode_first_stage") and model.first_stage is not None:
            from lidar_layout_tpu.train.diffusion_trainer import ema_params
            from lidar_layout_tpu.train.sample_logger import lidm_log_images

            def render_fn(state, rng):  # ImageLogger: the full log_images suite
                return lidm_log_images(model, ema_params(model, state),
                                       val_cache[0], rng)
    else:
        # every other registered family (KL / gaus / object / cube / R2DM)
        # routes through the per-family dispatch; previously these configs
        # crashed in the LatentDiffusion branch
        from lidar_layout_tpu.train.build import build_family_trainer
        ft = build_family_trainer(model, model_cfg, seed=args.seed, lr=lr,
                                  accumulate=accumulate, geom=geom)
        if ft.state is None:  # data-shape-dependent init (cube families)
            ft.state = ft.make_state(val_cache[0])
        state, step, val_step = ft.state, ft.step, ft.val_step
        monitor = ft.monitor
        render_fn = ft.render_fn

    if args.resume:
        from lidar_layout_tpu.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(os.path.join(args.resume, "ckpt"), state)
        print(f"resumed from {args.resume}")

    state = replicate(state, mesh)

    def batches():
        for b in raw_batches:
            yield shard_batch({k: v for k, v in b.items()}, mesh)

    # ValidationHook must precede the writer/saver hooks: they consume the
    # val/* metrics it merges into the step logs
    hooks = [IterationTimer(),
             ValidationHook(val_step, val_batches_factory,
                            every_steps=val_every),
             InformationWriter(),
             CheckpointSaver(every_steps=max(args.steps // 5, 1)),
             BestCheckpointSaver(monitor=monitor, top_k=3)]
    if render_fn is not None:
        from lidar_layout_tpu.train.sample_logger import SampleLogger
        hooks.append(SampleLogger(render_fn, every_steps=sample_every))

    trainer = Trainer(step, state, batches(), workdir=workdir,
                      max_steps=args.steps, hooks=hooks, seed=args.seed)
    # persist the merged config for later -r re-merge (main.py:560-568)
    os.makedirs(workdir, exist_ok=True)
    try:
        import yaml
        with open(os.path.join(workdir, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg, f)
    except Exception as e:
        print(f"config save skipped: {e}")

    trainer.train()
    print(f"done: {trainer.global_step} steps -> {workdir}")


if __name__ == "__main__":
    main()
