"""End-to-end test of the octvr_gain_and_remap CLI equivalent
(apps/octvr/gain_and_remap.cpp): gains solved on the stitched canvas are
pulled back into source geometry and baked into the source pixels."""

import numpy as np

from octvr_tpu.cli.gain_and_remap import main as gain_main
from octvr_tpu.template import compile_rig, save_npz
from octvr_tpu.utils.png import read_png, write_png

from rigs import two_fisheye_rig


def test_gain_and_remap_harmonizes_exposure(tmp_path):
    rig = two_fisheye_rig()
    # small sizes for test speed
    for inp in rig["inputs"]:
        inp["options"]["width"] = 256
        inp["options"]["height"] = 256
    mt = compile_rig(rig, 256, 128)
    stitch_path = tmp_path / "stitch.npz"
    save_npz(mt, str(stitch_path))

    # rmap templates: canvas -> each source geometry (json_reverse flow)
    rmap_paths = []
    for i, inp in enumerate(rig["inputs"]):
        rev = {"output": rig["inputs"][i], "inputs": [rig["output"]]}
        rt = compile_rig(rev, 256, 256)
        p = tmp_path / f"rmap{i}.npz"
        save_npz(rt, str(p))
        rmap_paths.append(str(p))

    # two flat gray images, one 1.5x brighter (exposure mismatch)
    img_paths = []
    rng = np.random.default_rng(0)
    base = rng.integers(90, 110, (256, 256, 3)).astype(np.uint8)
    for i, scale in enumerate((1.0, 1.5)):
        img = np.clip(base.astype(np.float32) * scale, 0, 255).astype(
            np.uint8
        )
        p = tmp_path / f"img{i}.png"
        write_png(str(p), img)
        img_paths.append(str(p))

    rc = gain_main([str(stitch_path)] + img_paths + rmap_paths)
    assert rc == 0

    g0 = read_png(img_paths[0] + ".gain.png").astype(np.float32)
    g1 = read_png(img_paths[1] + ".gain.png").astype(np.float32)
    in0 = read_png(img_paths[0]).astype(np.float32)
    in1 = read_png(img_paths[1]).astype(np.float32)
    # gains must pull the two exposures toward each other
    before = abs(in1.mean() - in0.mean())
    after = abs(g1.mean() - g0.mean())
    assert after < 0.6 * before, (before, after)
