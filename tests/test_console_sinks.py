"""Operator-console surface (VERDICT r3 next #6): the output-sink
matrix (mainwindow.cpp:110-176 ffmpeg command assembly) and the
interactive status console (runner.cpp:40-95 supervision made visible,
preview_video.cpp:68-98 status row)."""

import os
import sys
import time

import numpy as np
import pytest

from octvr_tpu.cli.sinks import (
    build_delivery_command,
    parse_sink_spec,
    sink_output_args,
)


def test_sink_arg_blocks_mirror_reference():
    """Per-sink flag blocks match mainwindow.cpp:114-165."""
    hls = sink_output_args("hls", "live/out.m3u8", bitrate="8", gop="60")
    assert hls == [
        "-c:v", "libx264", "-pix_fmt", "yuv420p", "-b:v", "8M",
        "-g", "60", "-f", "hls", "-hls_time", "2", "-hls_list_size", "4",
        "-hls_flags", "delete_segments", "-hls_allow_cache", "0",
        "-y", "live/out.m3u8",
    ]
    pipe = sink_output_args("pipe", "tcp://127.0.0.1:9000", format="nut")
    assert pipe == [
        "-c:v", "rawvideo", "-pix_fmt", "yuv420p", "-f", "nut",
        "-y", "tcp://127.0.0.1:9000",
    ]
    fil = sink_output_args("file", "out.mp4", codec="libx265")
    assert fil[:2] == ["-c:v", "libx265"] and fil[-2:] == ["-y", "out.mp4"]
    dl = sink_output_args("decklink", "DeckLink 4K", fps="25")
    assert dl == [
        "-pix_fmt", "uyvy422", "-f", "decklink", "-r", "25",
        "-vsync", "drop", "-preroll", "0.5", "DeckLink 4K",
    ]
    rtmp = sink_output_args("rtmp", "rtmp://a/b")
    assert "-f" in rtmp and rtmp[rtmp.index("-f") + 1] == "flv"
    assert sink_output_args("null", "") == [
        "-c:v", "rawvideo", "-f", "null", "-",
    ]


def test_parse_sink_spec_urls_and_options():
    kind, target, kw = parse_sink_spec(
        "rtmp:rtmp://host:1935/app/key|bitrate=6|gop=50"
    )
    assert kind == "rtmp"
    assert target == "rtmp://host:1935/app/key"
    assert kw == {"bitrate": "6", "gop": "50"}
    with pytest.raises(ValueError):
        parse_sink_spec("webrtc:whatever")
    with pytest.raises(ValueError):
        parse_sink_spec("hls:a.m3u8|nonsense=1")


def test_build_delivery_command_fanout():
    """One -map 0:v output block per sink; null fallback with none
    (mainwindow.cpp:168-172)."""
    cmd = build_delivery_command(
        3840, 1920, 30,
        ["hls:o.m3u8", "file:o.mp4", "pipe:tcp://h:1"],
        source="/tmp/x.fifo",
    )
    assert cmd[:1] == ["ffmpeg"]
    assert cmd[cmd.index("-s") + 1] == "3840x1920"
    assert cmd[cmd.index("-i") + 1] == "/tmp/x.fifo"
    assert cmd.count("-map") == 3
    empty = build_delivery_command(64, 32, 30, [])
    assert empty.count("-map") == 1 and empty[-2:] == ["null", "-"]


def test_supervisor_stop_and_restart(tmp_path):
    """LiveSupervisor: operator restart relaunches without consuming a
    failure attempt; operator stop exits 0 (runner.cpp:58-72 roles)."""
    import threading

    from octvr_tpu.cli.live import LiveSupervisor

    marker = tmp_path / "starts"
    # child appends a line then sleeps; exit code on SIGTERM is nonzero
    cmd = [
        sys.executable,
        "-c",
        (
            "import sys, time;"
            f"open({str(marker)!r}, 'a').write('x\\n');"
            "time.sleep(30)"
        ),
    ]
    sup = LiveSupervisor(cmd, restarts=0)
    th = threading.Thread(target=lambda: setattr(sup, "_rc", sup.run()))
    th.start()
    deadline = time.time() + 20
    while time.time() < deadline:
        if marker.exists() and len(marker.read_text().splitlines()) >= 1:
            break
        time.sleep(0.05)
    sup.restart()
    while time.time() < deadline:
        if marker.exists() and len(marker.read_text().splitlines()) >= 2:
            break
        time.sleep(0.05)
    sup.stop()
    th.join(timeout=20)
    assert not th.is_alive()
    assert sup._rc == 0  # operator stop is a clean exit
    assert len(marker.read_text().splitlines()) == 2  # restarted once
    assert sup.restart_count == 1


def test_console_state_reads_preview(tmp_path):
    """ConsoleState: status lines pick up frame/fps from the mmap
    preview channel and the stop key reaches the supervisor."""
    from octvr_tpu.cli.console import ConsoleState, ascii_preview
    from octvr_tpu.runtime.preview import PreviewWriter

    class FakeSup:
        state = "running"
        attempt = 0
        restart_count = 3
        stopped = False

        def stop(self):
            self.stopped = True

        def restart(self):
            pass

    path = str(tmp_path / "p.shm")
    wr = PreviewWriter(path, 32, 16)
    rgb = np.full((16, 32, 3), 200, np.uint8)
    rgb[:, :16] = 10  # dark left half -> visible ramp contrast
    wr.write(rgb, fps=29.5, frame_no=7)

    sup = FakeSup()
    cs = ConsoleState(sup, path)
    lines = cs.status_lines()
    text = "\n".join(lines)
    assert "restarts: 3" in text
    assert "frame 7" in text and "29.50" in text
    strip = ascii_preview(rgb)
    assert strip[0] != strip[-1]  # contrast visible
    assert cs.handle_key("q") is True and sup.stopped
    cs.close()
    wr.close()


def test_console_state_no_preview_yet(tmp_path):
    from octvr_tpu.cli.console import ConsoleState

    class FakeSup:
        state = "idle"
        attempt = 0
        restart_count = 0

    cs = ConsoleState(FakeSup(), str(tmp_path / "absent.shm"))
    assert any("no preview" in ln for ln in cs.status_lines())
