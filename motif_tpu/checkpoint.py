"""Checkpointing: orbax for native checkpoints + a porting bridge from
reference torch state dicts (best.pth etc., reference base_model.py:79-101).

Porting contract: flax module trees in this package mirror the torch module
trees, with Sequential/ModuleList numeric indices merged into the preceding
name ("net.0.linear" → modules "net_0" / "linear"). Torch attribute names
never consist of digits only, so the rewrite is unambiguous.

Tensor layout conversions:
 * conv weight (O, I, kH, kW)  → kernel (kH, kW, I, O)
 * linear weight (O, I)        → kernel (I, O)
 * conv3d weight               → (kD, kH, kW, I, O)
 * 1-D bias / scalars          → unchanged
"""

from __future__ import annotations

import os
import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def torch_key_to_flax_path(key: str) -> tuple[str, ...]:
    """'a.b.0.linear.weight' → ('a', 'b_0', 'linear', 'kernel')."""
    parts = key.split(".")
    out: list[str] = []
    for p in parts:
        if out and (p.isdigit() or p in ("l1", "l2", "l3")):
            # Sequential/ModuleList indices and EDVR's ModuleDict level keys
            # (EDVR.py:28-46) merge into the preceding attribute name.
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    if out[-1] == "weight":
        out[-1] = "kernel"
    return tuple(out)


# torch ConvTranspose2d stores weights (in, out, kh, kw); the only
# transposed convs in the reference are PWC-Net's up-samplers.
TRANSPOSED_CONV_NAMES = ("moduleUpflow", "moduleUpfeat")


def _convert_tensor(path: tuple[str, ...], t: np.ndarray) -> np.ndarray:
    if path[-1] == "kernel":
        if t.ndim == 4 and any(n in path for n in TRANSPOSED_CONV_NAMES):
            return np.transpose(t, (2, 3, 0, 1))  # (in,out,kh,kw) → HWIO
        if t.ndim == 4:       # conv OIHW → HWIO
            return np.transpose(t, (2, 3, 1, 0))
        if t.ndim == 2:       # linear OI → IO
            return np.transpose(t, (1, 0))
        if t.ndim == 5:       # conv3d
            return np.transpose(t, (2, 3, 4, 1, 0))
    return t


def port_torch_state_dict(state_dict: Mapping[str, Any],
                          strip_prefix: str = "module.",
                          skip: tuple[str, ...] = ("g_filter",
                                                   "num_batches_tracked",
                                                   # RAFT's ResidualBlock
                                                   # registers norm3 AND
                                                   # aliases it inside the
                                                   # downsample Sequential
                                                   # (extractor.py:20,44-45);
                                                   # the identical tensors
                                                   # arrive as downsample.1.
                                                   ".norm3.")) -> dict:
    """Convert a torch state dict (str → tensor/ndarray) into a nested flax
    params dict. Strips DataParallel 'module.' prefixes and unwraps a
    'params' key like the reference loader (base_model.py:89-101)."""
    if "params" in state_dict and not hasattr(state_dict["params"], "shape"):
        state_dict = state_dict["params"]
    tree: dict = {}
    for key, value in state_dict.items():
        if key.startswith(strip_prefix):
            key = key[len(strip_prefix):]
        if any(s in key for s in skip):
            continue
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        path = torch_key_to_flax_path(key)
        arr = _convert_tensor(path, arr)
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(arr)
    return upgrade_param_layout(tree)


def upgrade_param_layout(tree):
    """Rewrite a ported torch tree (or an old-layout native orbax tree) into
    this package's parameter layout: separate pcd_h/pcd_c (unstacking any
    interim stacked 'pcd_hc' trees) and stacked scanned residual-block
    families."""
    return _stack_scanned_blocks(_unstack_pcd_pairs(tree))


def _unstack_pcd_pairs(tree):
    """DeformableConvLSTM keeps the reference's separate pcd_h / pcd_c
    EasyPCD stacks (Ours.py:230-231) — torch trees map 1:1. An interim
    layout stacked them as one 'pcd_hc' subtree with a leading [h, c] axis
    (the vmapped fold was later reverted: ~26% slower on v5e); checkpoints
    saved in that window are unstacked here."""
    if not isinstance(tree, dict):
        return tree
    if "pcd_hc" in tree and "pcd_h" not in tree:
        hc = tree.pop("pcd_hc")
        tree["pcd_h"] = jax.tree.map(lambda a: a[0], hc)
        tree["pcd_c"] = jax.tree.map(lambda a: a[1], hc)
    return {k: _unstack_pcd_pairs(v) for k, v in tree.items()}


# Residual-block stacks that run as ONE nn.scan body with the per-block
# weights stacked on a leading axis (models/layers.py::ResBlocks). The torch
# side unrolls them as <name>.0 .. <name>.{k-1} (make_layer Sequentials:
# module_util.py:27-31; EDVR.py 'reconstruction').
SCANNED_BLOCK_FAMILIES = ("feature_extraction", "recon_trunk",
                          "reconstruction")


def _stack_scanned_blocks(tree):
    if not isinstance(tree, dict):
        return tree
    for fam in SCANNED_BLOCK_FAMILIES:
        idxs = []
        for k in tree:
            m = re.fullmatch(re.escape(fam) + r"_(\d+)", k)
            if m:
                idxs.append(int(m.group(1)))
        if not idxs or sorted(idxs) != list(range(len(idxs))):
            continue
        blocks = [tree.pop(f"{fam}_{i}") for i in range(len(idxs))]
        tree[fam] = {"block": jax.tree.map(
            lambda *xs: jnp.stack(xs), *blocks)}
    return {k: _stack_scanned_blocks(v) for k, v in tree.items()}


def load_reference_checkpoint(path: str) -> dict:
    """Load a reference .pth and port it to a flax params tree."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return port_torch_state_dict(sd)


def verify_port(params: dict, ported: dict, prefix: str = "") -> list[str]:
    """Compare a randomly-initialised params tree against a ported tree;
    return a list of mismatched/missing paths (empty == clean port)."""
    problems: list[str] = []
    keys = set(params) | set(ported)
    for k in sorted(keys):
        p = f"{prefix}/{k}"
        if k not in params:
            problems.append(f"extra in ported: {p}")
        elif k not in ported:
            problems.append(f"missing in ported: {p}")
        elif isinstance(params[k], dict) != isinstance(ported[k], dict):
            problems.append(f"tree/leaf mismatch: {p}")
        elif isinstance(params[k], dict):
            problems.extend(verify_port(params[k], ported[k], p))
        elif params[k].shape != ported[k].shape:
            problems.append(f"shape {p}: {params[k].shape} vs {ported[k].shape}")
    return problems


def _merge_params(target, ported):
    """Use ported leaves where present, keep target elsewhere."""
    if not isinstance(target, dict):
        return ported if ported is not None else target
    return {k: _merge_params(target[k], ported.get(k)) if k in ported
            else target[k] for k in target}


def load_params(path: str, params: dict, logger=None) -> dict:
    """Load model params from either a reference torch .pth (via the porting
    bridge) or a native orbax checkpoint dir, merged over `params` (an
    initialized tree providing structure). The CLI-facing equivalent of the
    reference load_network (base_model.py:89-101)."""
    if path.endswith((".pth", ".pt")):
        ported = load_reference_checkpoint(path)
        problems = verify_port(params, ported)
        missing = [p for p in problems if not p.startswith("extra")]
        if missing and logger:
            logger.warning("port issues: %s", missing[:10])
        if logger:
            extra = [p for p in problems if p.startswith("extra")]
            logger.info("loaded torch checkpoint %s (%d unused keys)",
                        path, len(extra))
        return _merge_params(params, ported)
    import orbax.checkpoint as ocp

    # accept a checkpoint ROOT (experiments/<name>/models) and resolve it to
    # its newest step_N dir, like the reference's resume_state auto-pick
    # (option.py check_resume); a step dir or params dir passes through.
    if not os.path.exists(os.path.join(path, "_METADATA")):
        step = latest_step(path)
        if step is not None:
            path = os.path.join(path, f"step_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    # accept either a bare params tree or a full TrainState-like dict
    if isinstance(restored, dict) and "params" in restored:
        restored = restored["params"]
    # Old-layout native checkpoints (pre pcd_hc / scanned-trunk renames)
    # restore through the same layout upgrade as torch ports, and the orbax
    # path verifies like the torch path does — a silent _merge_params of a
    # mismatched tree would keep randomly-initialized subtrees.
    restored = upgrade_param_layout(restored)
    problems = verify_port(params, restored)
    missing = [p for p in problems if not p.startswith("extra")]
    if missing:
        msg = ("orbax checkpoint %s does not match the model param tree "
               "(%d issues, e.g. %s) — the merged tree keeps RANDOM INIT "
               "for those subtrees" % (path, len(missing), missing[:5]))
        if logger:
            logger.warning(msg)
        else:
            import warnings
            warnings.warn(msg)
    if logger:
        logger.info("loaded orbax checkpoint %s", path)
    return _merge_params(params, restored)


# ---------------------------------------------------------------------------
# orbax native checkpointing (weights + opt state + step), reference
# base_model.py:79-123 equivalent
# ---------------------------------------------------------------------------

def save_train_state(ckpt_dir: str, step: int, state,
                     meta: dict | None = None) -> None:
    """Orbax state checkpoint + optional JSON meta sidecar (epoch etc. —
    the reference's .state file stores epoch alongside iter,
    base_model.py:103-112)."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def restore_train_state(ckpt_dir: str, step: int, target):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def restore_meta(ckpt_dir: str, step: int) -> dict:
    import json

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}")) + ".meta.json"
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(m.group(1)) for d in os.listdir(ckpt_dir)
             if (m := re.fullmatch(r"step_(\d+)", d))]
    return max(steps) if steps else None
