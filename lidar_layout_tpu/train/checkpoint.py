"""Checkpointing via orbax: {params, ema, opt_state, step} + resume.

Parity: the reference's Lightning ModelCheckpoint (save_top_k/save_last,
main.py:596-617) and pointcept CheckpointLoader/Saver (hooks/misc.py:141-276),
plus the model-level partial load with ignore_keys (ddpm.py:189-205).
Also provides a torch->flax state-dict bridge hook for parity testing.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _mgr(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    max_to_keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(jax.tree.map(np.asarray, state)))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _mgr(ckpt_dir)
    s = mgr.latest_step()
    mgr.close()
    return s


def restore_checkpoint(ckpt_dir: str, target: Any, step: Optional[int] = None
                       ) -> Any:
    """Restore into the structure of ``target`` (a matching pytree)."""
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    out = mgr.restore(step, args=ocp.args.StandardRestore(
        jax.tree.map(np.asarray, target)))
    mgr.close()
    return out


def load_first_stage_params(path: str, template: Dict) -> Dict:
    """First-stage ``ckpt_path`` injection (ddpm.py instantiate_first_stage +
    configs/lidar_diffusion/kitti/uncond_c2_p4.yaml:33): load trained AE
    weights into a LatentDiffusion's ``params['first_stage']`` slot.

    Accepts, in order of probing:
      - a torch ``.ckpt``/``.pt`` file (the reference's published AE
        checkpoints) -> converted via utils.torch_convert;
      - an AE training workdir (contains ``ckpt/``) or the ckpt dir itself ->
        orbax raw restore, extracting ``params_g`` (AETrainState field).
    The restored tree must match ``template``'s structure.
    """
    if os.path.isfile(path) and path.endswith((".ckpt", ".pt", ".pth")):
        from ..utils.torch_convert import (convert_vq_autoencoder,
                                           load_torch_state_dict, merge_into)
        return merge_into(template, convert_vq_autoencoder(
            load_torch_state_dict(path)))

    ckpt_dir = path
    if os.path.isdir(os.path.join(path, "ckpt")):
        ckpt_dir = os.path.join(path, "ckpt")
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no AE checkpoint under {ckpt_dir}")
    raw = mgr.restore(step)  # raw pytree (no target): nested dict of arrays
    mgr.close()
    sub = raw.get("params_g", raw.get("params", raw))
    tdef = jax.tree_util.tree_structure(template)
    rdef = jax.tree_util.tree_structure(sub)
    if tdef != rdef:
        raise ValueError(
            f"first-stage checkpoint at {path} does not match the configured "
            f"AE architecture (tree structures differ)")
    return jax.tree.map(lambda t, r: np.asarray(r, dtype=t.dtype),
                        template, sub)


def load_params_with_ignore(params: Dict, restored: Dict,
                            ignore_keys: List[str]) -> Dict:
    """Partial load: keep init values for subtrees whose dotted path starts
    with any ignore key (ddpm.py:189-205 semantics)."""
    import flax

    flat_init = flax.traverse_util.flatten_dict(params)
    flat_new = flax.traverse_util.flatten_dict(restored)
    out = {}
    for path, val in flat_init.items():
        dotted = ".".join(str(p) for p in path)
        if any(dotted.startswith(ik) for ik in ignore_keys):
            out[path] = val
        else:
            out[path] = flat_new.get(path, val)
    return flax.traverse_util.unflatten_dict(out)
