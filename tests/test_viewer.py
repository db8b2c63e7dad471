"""Terminal viewer: ANSI rendering units + a PTY-driven interactive run.

The PTY test re-creates the two crashes found while driving the viewer
(missing os import in the CLI, ZeroDivisionError on unsized PTYs)."""

import os
import re
import select
import sys
import time

import numpy as np
import pytest

from rsoderh_raytracing_tpu.viewer.terminal import _render_ansi


def test_render_ansi_basic():
    img = np.random.default_rng(0).random((32, 48, 3)).astype(np.float32)
    frame = _render_ansi(img, 80, 24)
    lines = frame.split("\n")
    assert len(lines) == 16  # two pixel rows per text line
    assert "\x1b[38;2;" in frame and "▀" in frame
    assert frame.count("▀") == 16 * 48


def test_render_ansi_downsamples_to_fit():
    img = np.zeros((128, 256, 3), np.float32)
    frame = _render_ansi(img, 64, 20)
    lines = frame.split("\n")
    assert len(lines) <= 20
    assert frame.count("▀") <= 64 * 20


def test_render_ansi_zero_terminal_size():
    """Unsized PTYs report 0x0; must not divide by zero."""
    img = np.zeros((16, 16, 3), np.float32)
    frame = _render_ansi(img, 0, -2)
    assert "▀" in frame


def test_parse_input_events():
    from rsoderh_raytracing_tpu.viewer.terminal import parse_input

    # keys + SGR mouse + incomplete tail stays pending
    events, rest = parse_input(b"wA\x1b[<35;10;12M\x1b[<35;2")
    assert events == [
        ("key", "w"),
        ("key", "A"),
        ("mouse", 35, 10, 12, True),
    ]
    assert rest == b"\x1b[<35;2"
    events, rest = parse_input(rest + b"0;14Mq")
    assert events == [("mouse", 35, 20, 14, True), ("key", "q")]
    assert rest == b""
    # unrelated CSI sequences (arrow keys) are swallowed whole
    events, rest = parse_input(b"\x1b[Aw")
    assert events == [("key", "w")]
    assert rest == b""


def test_fit_resolution():
    from rsoderh_raytracing_tpu.viewer.terminal import _fit_resolution

    # terminal smaller than the requested max: follow the cell grid,
    # quantized to 8 (one pixel per half-block slot; 2 rows reserved)
    assert _fit_resolution(256, 144, 26, 14) == (24, 24)
    assert _fit_resolution(256, 144, 100, 40) == (96, 72)
    # terminal larger than the requested max: the request caps it
    assert _fit_resolution(32, 24, 500, 200) == (32, 24)
    # unsized PTY: keep the requested resolution
    assert _fit_resolution(64, 48, 0, 0) == (64, 48)
    assert _fit_resolution(64, 48, -1, 2) == (64, 48)
    # tiny but sized terminals floor at 16
    assert _fit_resolution(256, 144, 5, 4) == (16, 16)


def test_viewer_non_tty_refuses(default_scene, capsys):
    from rsoderh_raytracing_tpu.scene.camera import KeyboardLayout
    from rsoderh_raytracing_tpu.viewer.terminal import run_viewer

    layout = KeyboardLayout.parse_config("wasdqe", "cpe")
    assert run_viewer(default_scene, layout, width=16, height=12) == 2


@pytest.mark.skipif(sys.platform != "linux", reason="needs pty")
def test_viewer_pty_end_to_end(assets_dir):
    """Run the CLI viewer as a fresh process on a PTY pair (forking the
    test process after XLA backend init would hang), watch frames
    accumulate, press 'p' (camera state) and 'q' (quit)."""
    import pty as pty_mod
    import subprocess

    master, slave = pty_mod.openpty()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "rsoderh_raytracing_tpu.cli",
            "--scene",
            os.path.join(assets_dir, "scenes", "default.toml"),
            "--view",
            "--resolution",
            "32x24",
        ],
        stdin=slave,
        stdout=slave,
        stderr=slave,
        env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
        close_fds=True,
    )
    os.close(slave)

    out = b""
    sent_p = sent_cont = sent_mouse = sent_p2 = sent_cont2 = sent_q = False
    deadline = time.time() + 240
    try:
        while time.time() < deadline:
            r, _, _ = select.select([master], [], [], 1.0)
            if r:
                try:
                    out += os.read(master, 262144)
                except OSError:
                    break
            if (
                out.count(b"\xe2\x96\x80") > 100
                and b"spp=" in out
                and not sent_p
            ):
                os.write(master, b"p")
                sent_p = True
            if sent_p and not sent_cont and b"for use with --state" in out:
                os.write(master, b" ")
                sent_cont = True
            if sent_cont and not sent_mouse:
                time.sleep(0.5)
                # Toggle mouse capture ('c'), then stream SGR any-motion
                # reports — a horizontal swipe that must change yaw.
                os.write(
                    master,
                    b"c\x1b[<35;10;10M\x1b[<35;14;10M\x1b[<35;20;10M",
                )
                sent_mouse = True
            if sent_mouse and not sent_p2:
                time.sleep(0.5)
                os.write(master, b"p")
                sent_p2 = True
            if (
                sent_p2
                and not sent_cont2
                and out.count(b"for use with --state") >= 2
            ):
                os.write(master, b" ")
                sent_cont2 = True
            if sent_cont2 and not sent_q:
                time.sleep(1.0)
                os.write(master, b"q")
                sent_q = True
            if sent_q and proc.poll() is not None:
                break
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
        os.close(master)

    assert out.count(b"\xe2\x96\x80") > 100, f"no frames rendered: {out[-400:]!r}"
    spps = [int(x) for x in re.findall(rb"spp=(\d+)", out)]
    assert spps and spps[-1] >= 1, "progressive spp counter missing"
    assert sent_p and b"for use with --state" in out, "p key state print"
    # Mouse-look: the two printed camera states must differ (the swipe
    # turned the camera), and mouse reporting was enabled on capture.
    assert b"\x1b[?1003h" in out, "capture toggle enables mouse reporting"
    states = re.findall(rb"for use with --state[^\n]*\n\s*(\S+)", out)
    assert len(states) >= 2, f"expected two state prints: {out[-400:]!r}"
    assert states[0] != states[1], "mouse swipe did not move the camera"


@pytest.mark.skipif(sys.platform != "linux", reason="needs pty")
def test_viewer_pty_resize(assets_dir):
    """Terminal resize re-targets the render resolution and resets the
    film (the reference's Resized contract, src/app.rs:120 ->
    src/state.rs:651-700): start on a small PTY, watch the status line
    report the fitted resolution, enlarge the PTY window, and watch the
    resolution follow (accumulation restarts, spp counter included)."""
    import fcntl
    import pty as pty_mod
    import struct
    import subprocess
    import termios as termios_mod

    def set_winsize(fd, rows, cols):
        fcntl.ioctl(
            fd,
            termios_mod.TIOCSWINSZ,
            struct.pack("HHHH", rows, cols, 0, 0),
        )

    master, slave = pty_mod.openpty()
    set_winsize(master, 14, 26)  # fits (24, 24) under a 32x24 request
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "rsoderh_raytracing_tpu.cli",
            "--scene",
            os.path.join(assets_dir, "scenes", "default.toml"),
            "--view",
            "--resolution",
            "32x24",
        ],
        stdin=slave,
        stdout=slave,
        stderr=slave,
        env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
        close_fds=True,
    )
    os.close(slave)

    out = b""
    resized = sent_q = False
    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            r, _, _ = select.select([master], [], [], 1.0)
            if r:
                try:
                    out += os.read(master, 262144)
                except OSError:
                    break
            if not resized and re.search(rb"24x24 spp=[1-9]", out):
                # small-terminal frames accumulated; grow the window
                set_winsize(master, 40, 100)
                resized = True
            if resized and not sent_q and re.search(
                rb"32x24 spp=[1-9]", out
            ):
                os.write(master, b"q")
                sent_q = True
            if sent_q and proc.poll() is not None:
                break
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
        os.close(master)

    assert re.search(rb"24x24 spp=[1-9]", out), (
        f"small-terminal fitted resolution missing: {out[-400:]!r}"
    )
    assert re.search(rb"32x24 spp=[1-9]", out), (
        f"post-resize resolution missing: {out[-400:]!r}"
    )
    # Film reset on resize: the first spp reported at the new resolution
    # must restart low even though the small-res film had accumulated.
    first_new = re.search(rb"32x24 spp=(\d+)", out)
    small_spps = [
        int(m) for m in re.findall(rb"24x24 spp=(\d+)", out)
    ]
    assert first_new and int(first_new.group(1)) <= max(small_spps)


def test_top_level_view_api(default_scene):
    """rsoderh_raytracing_tpu.view mirrors the reference's run() entry:
    validates the keyboard layout and exits 2 without a TTY."""
    import pytest

    import rsoderh_raytracing_tpu as rt

    assert rt.view(default_scene) == 2  # captured stdio is not a TTY
    with pytest.raises(ValueError):
        rt.view(default_scene, movement_keys="abc")
