"""Numeric sanity helpers (the reference's only guard is one assert).

- `enable_nan_checks()`: global jax debug_nans (fails fast on the first NaN).
- `check_map(lm)`: host-side validation of a LocalMap: finite values, in-range
  block coordinates, symmetric V blocks, gauge ids present. Returns a list of
  problem strings (empty = healthy). Used by the CLI's --check flag and tests.
"""

from __future__ import annotations

import jax
import numpy as np


def enable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", True)


def check_map(lm) -> list[str]:
    probs = []
    h = jax.device_get(lm)
    for name in ("poses", "feats", "U", "W", "V"):
        a = np.asarray(getattr(h, name))
        if not np.isfinite(a).all():
            probs.append(f"non-finite values in {name}")
    M, N = h.poses.shape[0], h.feats.shape[0]
    Uij = np.asarray(h.Uij)
    if Uij.size and (Uij.min() < 0 or Uij.max() >= M):
        probs.append("U block coordinates out of range")
    Wpf = np.asarray(h.Wpf)
    if Wpf.size and (Wpf[:, 0].min() < 0 or Wpf[:, 0].max() >= M
                     or Wpf[:, 1].min() < 0 or Wpf[:, 1].max() >= N):
        probs.append("W block coordinates out of range")
    V = np.asarray(h.V)
    if V.size and np.abs(V - np.swapaxes(V, 1, 2)).max() > 1e-9:
        probs.append("V blocks not symmetric")
    ids = np.asarray(h.pose_ids)
    ref = int(h.gauge.ref)
    # stereo maps keep the reference implicit; mono must contain it
    if int(h.gauge.scap) >= 0 and ref not in ids:
        probs.append(f"gauge ref id {ref} not among pose ids")
    if int(h.gauge.scap) >= 0 and int(h.gauge.scap) not in ids:
        probs.append(f"gauge scap id {int(h.gauge.scap)} not among pose ids")
    dup = ids[ids >= 0]
    if len(set(dup.tolist())) != len(dup):
        probs.append("duplicate pose ids")
    return probs
