"""Native (C) runtime components, compiled on demand with a Python fallback.

Currently: `fastparse` — the local-map text reader hot path.
Build happens lazily into this package directory; failures fall back to the
pure-Python tokenizer in io/localmap.py.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
import sysconfig

log = logging.getLogger("linearsfm_tpu")

_HERE = os.path.dirname(os.path.abspath(__file__))


def _build() -> bool:
    import numpy as np
    src = os.path.join(_HERE, "fastparse.c")
    out = os.path.join(_HERE, f"fastparse{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    inc_py = sysconfig.get_paths()["include"]
    inc_np = np.get_include()
    cmd = ["gcc", "-O2", "-shared", "-fPIC", src, f"-I{inc_py}", f"-I{inc_np}",
           "-o", out]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            log.debug("fastparse build failed: %s", r.stderr.decode()[-400:])
            return False
        return True
    except Exception as e:  # noqa: BLE001
        log.debug("fastparse build error: %s", e)
        return False


_fastparse = None
_tried = False


def get_fastparse():
    """The compiled module, or None if unavailable."""
    global _fastparse, _tried
    if _tried:
        return _fastparse
    _tried = True
    if _build():
        try:
            from . import fastparse  # type: ignore
            _fastparse = fastparse
        except Exception:  # noqa: BLE001
            _fastparse = None
    return _fastparse
