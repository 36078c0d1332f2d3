"""Per-level checkpoint/resume for the merge tree.

The map set at tree level L is a complete restart point (the reference's
`m_LMset[i] = m_GMap` level state, LinearSFMImp.cpp:2032/:6604, but never
persisted there — no mid-run recovery exists in the reference). Each level's
compacted maps are dumped as one .npz per map plus a manifest; `latest`
returns the most recent complete level for elastic restart after preemption.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from .. import types

_FIELDS = ("pose_ids", "poses", "feat_ids", "feats", "U", "Uij", "W", "Wpf", "V",
           "n_poses", "n_feats", "n_U", "n_W")
_GAUGE = ("ref", "scap", "fix", "sign", "fref", "fscap", "ffix")


def save_level(ckpt_dir: str, level: int, maps: list[types.LocalMap]) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    for i, lm in enumerate(maps):
        arrs = {f: np.asarray(getattr(lm, f)) for f in _FIELDS}
        arrs.update({f"gauge_{f}": np.asarray(getattr(lm.gauge, f)) for f in _GAUGE})
        np.savez_compressed(os.path.join(ckpt_dir, f"level{level}_map{i}.npz"), **arrs)
    manifest = dict(level=level, count=len(maps))
    tmp = os.path.join(ckpt_dir, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(ckpt_dir, "manifest.json"))


def latest(ckpt_dir: str):
    """Returns (level, maps) of the newest complete checkpoint, or None."""
    path = os.path.join(ckpt_dir, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        manifest = json.load(fh)
    level, count = manifest["level"], manifest["count"]
    maps = []
    for i in range(count):
        f = np.load(os.path.join(ckpt_dir, f"level{level}_map{i}.npz"))
        gauge = types.Gauge(**{k: jnp.asarray(f[f"gauge_{k}"]) for k in _GAUGE})
        maps.append(types.LocalMap(
            **{k: jnp.asarray(f[k]) for k in _FIELDS}, gauge=gauge))
    return level, maps


# ---------------------------------------------------------------------------
# Stacked checkpoints (device-resident executor).
#
# The device tree's level boundary is ONE stacked [count, ...caps] LocalMap
# pytree; a checkpoint is a single .npz of its leaves plus the level index.
# Resume re-derives the (deterministic) capacity plan from the input maps and
# validates the stored shapes against it before skipping completed levels.
# ---------------------------------------------------------------------------

def save_stacked(ckpt_dir: str, level: int, st: types.LocalMap) -> None:
    """Persist the stacked level-boundary map set (input of level `level`)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    arrs = {f: np.asarray(getattr(st, f)) for f in _FIELDS}
    arrs.update({f"gauge_{f}": np.asarray(getattr(st.gauge, f))
                 for f in _GAUGE})
    tmp = os.path.join(ckpt_dir, "stacked.npz.tmp")
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, **arrs)
    os.replace(tmp, os.path.join(ckpt_dir, f"stacked_level{level}.npz"))
    mtmp = os.path.join(ckpt_dir, "stacked_manifest.json.tmp")
    with open(mtmp, "w") as fh:
        json.dump(dict(level=level), fh)
    os.replace(mtmp, os.path.join(ckpt_dir, "stacked_manifest.json"))


def latest_stacked(ckpt_dir: str):
    """Returns (level, stacked LocalMap) of the newest checkpoint, or None."""
    path = os.path.join(ckpt_dir, "stacked_manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        level = json.load(fh)["level"]
    f = np.load(os.path.join(ckpt_dir, f"stacked_level{level}.npz"))
    gauge = types.Gauge(**{k: f[f"gauge_{k}"] for k in _GAUGE})
    return level, types.LocalMap(**{k: f[k] for k in _FIELDS}, gauge=gauge)
