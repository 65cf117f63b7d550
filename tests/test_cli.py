import subprocess
import sys

import pytest

from vse_tpu.cli import main


def run_cli(args):
    return subprocess.run(
        [sys.executable, "-m", "vse_tpu.cli"] + args,
        capture_output=True, text=True, timeout=120,
        cwd="/root/repo",
    )


def test_help_lists_subcommands():
    r = run_cli(["--help"])
    assert r.returncode in (0, 2)
    assert "extract" in r.stdout + r.stderr
    assert "sync" in r.stdout + r.stderr


def test_extract_missing_video_fails():
    r = run_cli(["extract", "/nonexistent/video.mp4"])
    assert r.returncode != 0
    assert "not found" in r.stdout + r.stderr


def test_sync_requires_src_dst():
    r = run_cli(["sync"])
    assert r.returncode != 0
    assert "--src" in r.stderr + r.stdout
