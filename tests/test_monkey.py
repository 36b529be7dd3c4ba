"""monkeyVR CLI: rendezvous frame pairing + FastMapper NV12 stitch +
double-buffered encoder sink (samples/android/monkeyVR/jni/monkey.cpp,
codec.cpp roles)."""

import math
import socket
import struct
import threading

import numpy as np
import pytest

import jax.numpy as jnp

PI = math.pi


@pytest.fixture(scope="module")
def monkey_template(tmp_path_factory):
    from octvr_tpu.template import compile_rig
    from octvr_tpu.template.io import save_npz

    lens = {
        "width": 160,
        "height": 160,
        "hfov": PI * 1.15,
        "center_dx": 0.0,
        "center_dy": 0.0,
        "radial": [0.0, 0.0, 0.0],
    }
    rig = {
        "output": {"type": "equirectangular", "options": {}},
        "inputs": [
            {"type": "fullframe_fisheye", "options": dict(lens)},
            {
                "type": "fullframe_fisheye",
                "options": {
                    **lens,
                    "rotation": {"roll": 0.0, "yaw": PI, "pitch": 0.0},
                },
            },
        ],
    }
    mt = compile_rig(rig, 128, 64)
    mt.create_masks()
    path = tmp_path_factory.mktemp("monkey") / "tmpl.npz"
    save_npz(mt, str(path))
    return str(path), mt


def make_nv12_frames(n, h, w, seed):
    from octvr_tpu.ops.color import merge_nv12, split_yuv420p

    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        yuv = rng.integers(16, 235, (h * 3 // 2, w), dtype=np.uint8)
        nv12 = np.asarray(merge_nv12(*split_yuv420p(jnp.asarray(yuv))))
        frames.append(nv12)
    return frames


def test_monkey_raw_out(monkey_template, tmp_path):
    from octvr_tpu.cli.monkey import main

    tmpl, mt = monkey_template
    h = w = 160
    n = 4
    feeds = []
    for i in range(2):
        p = tmp_path / f"cam{i}.nv12"
        with open(p, "wb") as f:
            for fr in make_nv12_frames(n, h, w, seed=i):
                f.write(fr.tobytes())
        feeds.append(str(p))
    out = tmp_path / "out.nv12"
    rc = main(
        [
            "-t", tmpl,
            "--inputs", ",".join(feeds),
            "--in_size", f"{w}x{h}",
            "--out", str(out),
        ]
    )
    assert rc == 0
    W, H = mt.out_size
    data = out.read_bytes()
    frame_bytes = W * H * 3 // 2
    assert len(data) == n * frame_bytes
    # stitched output should not be blank
    first = np.frombuffer(data[:frame_bytes], np.uint8)
    assert first[: W * H].std() > 1.0


def test_monkey_tcp_sink(monkey_template, tmp_path):
    """codec.cpp's socket path: length-prefixed frames over TCP."""
    from octvr_tpu.cli.monkey import main

    tmpl, mt = monkey_template
    h = w = 160
    n = 3
    feeds = []
    for i in range(2):
        p = tmp_path / f"cam{i}.nv12"
        with open(p, "wb") as f:
            for fr in make_nv12_frames(n, h, w, seed=10 + i):
                f.write(fr.tobytes())
        feeds.append(str(p))

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    received = []

    def server():
        conn, _ = srv.accept()
        buf = b""
        conn.settimeout(10)
        try:
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    break
                buf += chunk
        except socket.timeout:
            pass
        off = 0
        while off + 4 <= len(buf):
            (ln,) = struct.unpack_from("<I", buf, off)
            off += 4
            received.append(buf[off : off + ln])
            off += ln
        conn.close()

    th = threading.Thread(target=server, daemon=True)
    th.start()
    rc = main(
        [
            "-t", tmpl,
            "--inputs", ",".join(feeds),
            "--in_size", f"{w}x{h}",
            "--tcp", f"127.0.0.1:{port}",
        ]
    )
    assert rc == 0
    th.join(timeout=15)
    srv.close()
    W, H = mt.out_size
    assert len(received) == n
    assert all(len(r) == W * H * 3 // 2 for r in received)


def test_monkey_unequal_feed_lengths(monkey_template, tmp_path):
    """Back feed ends FIRST (shorter): the CLI must terminate and emit
    exactly min(len(back), len(front)) frames — regression for the
    front-reader-blocks-forever hang."""
    from octvr_tpu.cli.monkey import main

    tmpl, mt = monkey_template
    h = w = 160
    lens = (2, 5)  # back shorter than front
    feeds = []
    for i, n in enumerate(lens):
        p = tmp_path / f"cam{i}.nv12"
        with open(p, "wb") as f:
            for fr in make_nv12_frames(n, h, w, seed=20 + i):
                f.write(fr.tobytes())
        feeds.append(str(p))
    out = tmp_path / "out.nv12"

    result = {}

    def run():
        result["rc"] = main(
            [
                "-t", tmpl,
                "--inputs", ",".join(feeds),
                "--in_size", f"{w}x{h}",
                "--out", str(out),
            ]
        )

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout=60)
    assert not th.is_alive(), "monkey CLI hung on unequal-length feeds"
    assert result["rc"] == 0
    W, H = mt.out_size
    assert len(out.read_bytes()) == min(lens) * (W * H * 3 // 2)


def test_frame_pair_rendezvous():
    """Back deposits + blocks until front pairs (monkey.cpp:92-130):
    pairing preserves per-feed order and backpressure."""
    from octvr_tpu.cli.monkey import FramePair

    pair = FramePair()
    got = []

    def back():
        for i in range(5):
            pair.put_back(("b", i))

    def front():
        for i in range(5):
            res = pair.pair_front(("f", i))
            got.append(res)

    tb = threading.Thread(target=back)
    tf = threading.Thread(target=front)
    tb.start()
    tf.start()
    tb.join(timeout=10)
    tf.join(timeout=10)
    assert got == [(("b", i), ("f", i)) for i in range(5)]


def test_frame_pair_front_ends_first():
    """FRONT feed ends while a back frame is parked in the rendezvous:
    put_back must release when finish_front() lands (round-5 advisor
    fix — previously only the back-ends-first ordering was covered and
    the parked back producer could spin until stop())."""
    from octvr_tpu.cli.monkey import FramePair

    pair = FramePair()
    released = threading.Event()

    def back():
        pair.put_back(("b", 0))  # front never pairs this
        released.set()

    tb = threading.Thread(target=back, daemon=True)
    tb.start()
    # let the back producer park
    assert not released.wait(timeout=0.3)
    pair.finish_front()  # the front reader hit EOF
    assert released.wait(timeout=5.0), (
        "put_back stayed parked after the front feed ended"
    )
    tb.join(timeout=5)
    assert not tb.is_alive()
