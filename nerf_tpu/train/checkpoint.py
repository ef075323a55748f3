"""Checkpoint save / restore / auto-resume.

Capability parity with the reference (``trainer.py:374-388`` save,
``trainer.py:182-211,246-269`` auto-resume): one self-contained file per
checkpoint holding both model param sets, optimizer state, config, and loss
history; ``checkpoint_epoch_{N}`` naming; resume picks the max-epoch file.

TPU-native format: instead of ``torch.save`` pickles, checkpoints are plain
``.npz`` archives of path-flattened pytree leaves plus a JSON sidecar header
(config + loss history + epoch) embedded in the same npz — portable,
pickle-free, readable by any numpy. Restore rebuilds arbitrary pytrees
(including optax states) against a template from ``init``. Cross-framework
interop with the reference's ``.pth`` format lives in
``models.nerf.params_from_torch_state_dict`` / ``params_to_torch_state_dict``.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax

SEP = "//"  # path separator inside npz keys


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = SEP.join(_path_elem_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_elem_str(p) -> str:
    if isinstance(p, jax.tree_util.DictKey):
        return f"d:{p.key}"
    if isinstance(p, jax.tree_util.SequenceKey):
        return f"s:{p.idx}"
    if isinstance(p, jax.tree_util.GetAttrKey):
        return f"a:{p.name}"
    return f"x:{p}"


def save_checkpoint(
    path: str, tree: Any, meta: Optional[Dict[str, Any]] = None
) -> None:
    """Save a pytree + JSON-serializable metadata to ``path`` (.npz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(tree)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode("utf-8"), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)  # atomic: no torn checkpoints on preemption


def restore_checkpoint(path: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore a pytree with the structure of ``template`` plus its metadata.

    Leaf dtypes/shapes come from the file; structure comes from the template
    (so optax states round-trip without pickling class instances).
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode("utf-8"))
        leaves_paths = jax.tree_util.tree_flatten_with_path(template)
        restored = []
        for tpath, tleaf in leaves_paths[0]:
            key = SEP.join(_path_elem_str(p) for p in tpath)
            if key not in data:
                raise KeyError(f"checkpoint {path} missing leaf {key}")
            arr = data[key]
            restored.append(jax.numpy.asarray(arr))
        tree = jax.tree_util.tree_unflatten(leaves_paths[1], restored)
    return tree, meta


def restore_bare_params(path: str, template: Any) -> Any:
    """Restore a params-only ``.npz`` keyed by ``jax.tree_util.keystr``
    paths (e.g. ``['coarse']['trunk'][0]['w']``) — the format evaluation
    scripts dump with a plain flatten (``results/convergence/
    final_params.npz``). No ``__meta__``, no optimizer state: just model
    weights against a params template."""
    with np.load(path) as data:
        leaves_paths = jax.tree_util.tree_flatten_with_path(template)
        restored = []
        for tpath, _ in leaves_paths[0]:
            key = jax.tree_util.keystr(tpath)
            if key not in data:
                raise KeyError(f"params archive {path} missing leaf {key}")
            restored.append(jax.numpy.asarray(data[key]))
        return jax.tree_util.tree_unflatten(leaves_paths[1], restored)


def has_checkpoint_meta(path: str) -> bool:
    """True if ``path`` is a full trainer checkpoint (has the ``__meta__``
    header), False for a bare params archive."""
    with np.load(path) as data:
        return "__meta__" in data


_CKPT_RE = re.compile(r"checkpoint_epoch_(\d+)\.npz$")


def checkpoint_path(checkpoint_dir: str, epoch: int) -> str:
    return os.path.join(checkpoint_dir, f"checkpoint_epoch_{epoch}.npz")


def find_latest_checkpoint(checkpoint_dir: str, exclude=()) -> Optional[str]:
    """Max-epoch ``checkpoint_epoch_*.npz`` in the directory (reference
    ``_find_latest_checkpoint``, ``trainer.py:246-269``). ``exclude`` paths
    are skipped (used by resume to step past unreadable files)."""
    if not os.path.isdir(checkpoint_dir):
        return None
    best: Tuple[int, Optional[str]] = (-1, None)
    for name in os.listdir(checkpoint_dir):
        m = _CKPT_RE.match(name)
        if m:
            path = os.path.join(checkpoint_dir, name)
            if path in exclude:
                continue
            epoch = int(m.group(1))
            if epoch > best[0]:
                best = (epoch, path)
    return best[1]
