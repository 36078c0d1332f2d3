"""Text-format round trip: write -> read -> identical map (both parsers)."""

import numpy as np

import helpers as H
from synth import generate as gen
from linearsfm_tpu.io import localmap as lio
import linearsfm_tpu.native as native


def _roundtrip(tmp_path, datatype, use_native):
    maps, _, _ = gen.make_dataset(3, datatype, noise=0.01, seed=17)
    p = str(tmp_path / "localmap_1.txt")
    maps[1].write(p)

    fp = native.get_fastparse()
    if use_native and fp is None:
        import pytest
        pytest.skip("native parser unavailable")
    native._tried = True
    native._fastparse = fp if use_native else None
    try:
        lm = lio.read_local_map(p, datatype)
    finally:
        native._tried = False

    src = maps[1]
    np.testing.assert_array_equal(np.asarray(lm.pose_ids), src.pose_ids)
    np.testing.assert_allclose(np.asarray(lm.poses), src.poses, rtol=1e-15)
    np.testing.assert_array_equal(np.asarray(lm.feat_ids), src.feat_ids)
    np.testing.assert_allclose(np.asarray(lm.feats), src.feats, rtol=1e-15)
    np.testing.assert_allclose(np.asarray(lm.V), src.V, rtol=1e-15)
    # W order may be permuted by feature grouping; compare densified info
    np.testing.assert_allclose(H.densify_info(lm),
                               H.densify_info(src.to_local_map()), rtol=1e-12,
                               atol=1e-12)
    assert int(lm.gauge.ref) == src.gauge["ref"]
    if datatype == "mono":
        assert int(lm.gauge.scap) == src.gauge["scap"]
        assert int(lm.gauge.fix) == src.gauge["fix"]


def test_roundtrip_stereo_python(tmp_path):
    _roundtrip(tmp_path, "stereo", use_native=False)


def test_roundtrip_mono_python(tmp_path):
    _roundtrip(tmp_path, "mono", use_native=False)


def test_roundtrip_stereo_native(tmp_path):
    _roundtrip(tmp_path, "stereo", use_native=True)


def test_roundtrip_mono_native(tmp_path):
    _roundtrip(tmp_path, "mono", use_native=True)


def test_check_map_flags_problems():
    import dataclasses
    import jax.numpy as jnp
    from linearsfm_tpu.utils import debug as dbg
    maps, _, _ = gen.make_dataset(2, "mono", noise=0.0, seed=20)
    lm = maps[0].to_local_map()
    assert dbg.check_map(lm) == []
    bad = dataclasses.replace(lm, V=jnp.asarray(np.asarray(lm.V)).at[0, 0, 0].set(np.nan))
    assert any("non-finite" in p for p in dbg.check_map(bad))
    bad2 = dataclasses.replace(lm, Uij=jnp.asarray(np.asarray(lm.Uij)).at[0, 0].set(99))
    assert any("out of range" in p for p in dbg.check_map(bad2))
