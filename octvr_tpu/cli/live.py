"""Live session runner — the OwlLive console's orchestration role
(apps/livestitching/runner.cpp:40-95 + mainwindow.cpp:18-108): validate
the rig against the inputs, spawn one template-compile process per
output, then launch and SUPERVISE the streaming stitcher, restarting it
on abnormal exit (the reference pops a warning and resets state,
runner.cpp:58-64,92-95; headless supervision restarts instead).

Usage:
  python -m octvr_tpu.cli.live \
      --rig rig.json --inputs in0.yuv,in1.yuv --in_size WxH \
      --out_size 3840x1920 --out pano.yuv \
      [--blend 128] [--frames N] [--preview prefix] [--restarts 2]
      [--workdir DIR]

Exit code 0 when the stream finishes cleanly (EOF or --frames reached);
nonzero when it keeps failing after --restarts attempts.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

__all__ = ["main", "validate_rig"]


def validate_rig(rig, n_inputs, in_size):
    """Template-vs-camera validation (mainwindow.cpp:18-56 behavior):
    input count and declared lens sizes must match the capture setup.
    Returns a list of problems (empty = ok)."""
    problems = []
    inputs = rig.get("inputs", [])
    if len(inputs) != n_inputs:
        problems.append(
            f"rig wants {len(inputs)} inputs, {n_inputs} streams given"
        )
    w, h = in_size
    for k, spec in enumerate(inputs):
        opts = spec.get("options", {})
        rw = opts.get("width")
        rh = opts.get("height")
        if rw is not None and rh is not None and (rw, rh) != (w, h):
            problems.append(
                f"input {k}: lens is {rw}x{rh}, stream is {w}x{h}"
            )
    return problems


def main(argv=None):
    from . import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--rig", required=True)
    ap.add_argument("--inputs", required=True)
    ap.add_argument("--in_size", required=True)
    ap.add_argument("--out_size", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--blend", type=int, default=128)
    ap.add_argument("--gain", type=int, default=0, help="-1 disables")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--preview", default=None)
    ap.add_argument(
        "--preview_shm",
        default=None,
        help="mmap live-preview file (runtime/preview.py); readable "
        "concurrently by any viewer process, the QSharedMemory preview "
        "role (preview_video.cpp)",
    )
    ap.add_argument("--restarts", type=int, default=2)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args(argv)

    with open(args.rig) as f:
        rig = json.load(f)
    in_paths = args.inputs.split(",")
    w_in, h_in = (int(v) for v in args.in_size.lower().split("x"))
    ow, oh = (int(v) for v in args.out_size.lower().split("x"))

    problems = validate_rig(rig, len(in_paths), (w_in, h_in))
    for p in problems:
        print(f"warning: {p}", file=sys.stderr)
    if any("wants" in p for p in problems):
        print("rig/stream mismatch, refusing to start", file=sys.stderr)
        return 2

    workdir = args.workdir or tempfile.mkdtemp(prefix="octvr_live_")
    os.makedirs(workdir, exist_ok=True)
    tmpl = os.path.join(workdir, "out0.npz")

    # stage 1: template compile in a child process (runner.cpp:84-87)
    print(f"# compiling template -> {tmpl}", file=sys.stderr)
    dump_cmd = [
        sys.executable,
        "-m",
        "octvr_tpu.cli.dump",
        "-w",
        str(ow),
        "-h",
        str(oh),
        "-o",
        tmpl,
        args.rig,
    ]
    res = subprocess.run(dump_cmd)
    if res.returncode != 0:
        print(
            f"template compile failed (rc={res.returncode})", file=sys.stderr
        )
        return 3

    # stage 2: streaming core under supervision (runner.cpp:58-72)
    stream_cmd = [
        sys.executable,
        "-m",
        "octvr_tpu.cli.stream",
        "--inputs",
        args.inputs,
        "--in_size",
        args.in_size,
        "--outputs",
        f"{tmpl}:{args.blend}:{args.gain}",
        "--out",
        args.out,
        "--timers",
    ]
    if args.frames:
        stream_cmd += ["--frames", str(args.frames)]
    if args.preview:
        stream_cmd += ["--preview", args.preview]
    if args.preview_shm:
        stream_cmd += ["--preview_shm", args.preview_shm]

    attempt = 0
    while True:
        t0 = time.time()
        print(f"# starting stream (attempt {attempt + 1})", file=sys.stderr)
        res = subprocess.run(stream_cmd)
        if res.returncode == 0:
            print("# stream finished cleanly", file=sys.stderr)
            return 0
        print(
            f"warning: stream exited abnormally rc={res.returncode} "
            f"after {time.time() - t0:.1f}s",
            file=sys.stderr,
        )
        attempt += 1
        if attempt > args.restarts:
            print("giving up after retries", file=sys.stderr)
            return 4


if __name__ == "__main__":
    sys.exit(main())
