"""Per-shard source-row windows + concat-source kernel layout
(src_windows=True): each input keeps its OWN sliced height inside one
batched kernel launch (row offsets baked into the window tables —
ops/pallas_remap.py concat mode).  Output must match the unsliced path
to quantization.  Opt-in: measured flat at 4K (BASELINE r4), kept for
memory-bound and mixed-size deployments."""

import numpy as np
import pytest

import jax

from octvr_tpu.parallel.sharded import ShardedMapper, make_mesh
from octvr_tpu.stitch import Mapper
from octvr_tpu.template import compile_rig

pytestmark = pytest.mark.slow


def test_src_windows_concat_matches_unsliced():
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import six_cam_rig

    assert len(jax.devices()) >= 8
    rig = six_cam_rig()
    for s in rig["inputs"]:
        s["options"]["width"] = s["options"]["height"] = 240
    mt = compile_rig(rig, 480, 240)
    mt.create_masks()
    sizes = [(240, 240)] * 6
    rng = np.random.default_rng(0)
    frames = []
    for c in range(6):
        base = rng.integers(40, 220, (8, 8)).astype(np.float32)
        up = np.kron(base, np.ones((45, 45)))[:360, :240]
        frames.append(np.clip(up[: 240 * 3 // 2], 16, 235).astype(np.uint8))

    single = Mapper(mt, sizes, blend=32, enable_gain=True, pipeline="yuv420")
    out_s, g_s = single.stitch(frames)

    sm = ShardedMapper(
        mt, sizes, make_mesh(1, 4), blend=32, enable_gain=True,
        pipeline="yuv420", src_windows=True,
    )
    # side cameras sliced, poles full, ONE concat kernel per plane
    assert any(h < 240 for h in sm.plan.src_h), sm.plan.src_h
    assert any(rp.concat_heights for rp in sm.plan.remap_groups)
    out_m, g_m = sm.stitch_batch([np.stack([f]) for f in frames])
    yuv = sm.assemble_yuv(np.asarray(out_m)[0])
    err = np.abs(
        yuv.astype(np.float32) - np.asarray(out_s).astype(np.float32)
    )
    assert err[:240].mean() < 0.05, err[:240].mean()
    np.testing.assert_allclose(
        np.asarray(g_m)[0], np.asarray(g_s), rtol=2e-3
    )
