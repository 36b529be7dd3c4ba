"""Capture-device enumeration + format negotiation (cli/inputs.py) —
the InputsSelector role (apps/livestitching/inputs_select.cpp)."""

import subprocess
import sys

from octvr_tpu.cli.inputs import (
    CameraInfo,
    build_capture_args,
    enumerate_cameras,
    negotiate_format,
)


def fake_cam(device="/dev/video7"):
    return CameraInfo(
        device=device,
        name="Fake SDI Capture",
        driver="fakedrv",
        formats={
            "MJPG": {(3840, 2160): [30.0, 25.0], (1920, 1080): [60.0, 30.0]},
            "UYVY": {(1920, 1080): [30.0, 25.0], (1280, 720): [60.0]},
        },
    )


def test_negotiate_prefers_uyvy_and_covering_size():
    # UYVY preferred over MJPG (the reference captures uyvy422,
    # inputs_select.cpp:151) even though MJPG supports a larger size
    fourcc, size, fps = negotiate_format(fake_cam(), 1280, 720, fps=30.0)
    assert fourcc == "UYVY"
    assert size == (1280, 720)
    assert fps == 60.0  # no rate <= 30 reported at 720p; lowest above


def test_negotiate_rate_and_fallback_size():
    fourcc, size, fps = negotiate_format(fake_cam(), 1920, 1080, fps=27.0)
    assert (fourcc, size, fps) == ("UYVY", (1920, 1080), 25.0)
    # request larger than anything UYVY offers: largest UYVY size wins
    # (preferred format beats a bigger size in a worse format)
    fourcc, size, _ = negotiate_format(fake_cam(), 3840, 2160)
    assert fourcc == "UYVY" and size == (1920, 1080)


def test_build_capture_args_matches_reference_shape():
    args = build_capture_args([fake_cam(), fake_cam("/dev/video9")], 1920, 1080)
    # one "-f v4l2 ... -i dev" group per camera (inputs_select.cpp:158-161)
    assert args.count("-f") == 2 and args.count("v4l2") == 2
    i7 = args.index("/dev/video7")
    assert args[i7 - 1] == "-i"
    assert args[args.index("-pixel_format") + 1] == "uyvy422"
    assert "1920x1080" in args and "30" in args


def test_enumerate_graceful_without_devices():
    # this container has no /dev/video*; must return [] without raising
    cams = enumerate_cameras()
    assert isinstance(cams, list)


def test_cli_reports_no_devices():
    res = subprocess.run(
        [sys.executable, "-m", "octvr_tpu.cli.inputs"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert res.returncode == 1
    assert "no capture devices" in res.stderr
