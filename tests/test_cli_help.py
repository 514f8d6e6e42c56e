"""Smoke: every CLI entry point imports and wires argparse (`--help` exits 0).

Cheap bitrot guard for the full reference-parity CLI surface (the functional
tests cover a subset deeply; this covers all of them shallowly).
"""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLIS = sorted(glob.glob(os.path.join(REPO, "cli", "*.py")))


def test_cli_inventory_nonempty():
    assert len(CLIS) >= 14


@pytest.mark.parametrize("cli", CLIS, ids=[os.path.basename(c) for c in CLIS])
def test_cli_help(cli):
    out = subprocess.run(
        [sys.executable, cli, "--help"],
        capture_output=True,
        text=True,
        timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=REPO,
    )
    assert out.returncode == 0, f"{os.path.basename(cli)} --help failed:\n{out.stderr[-2000:]}"
    assert "usage" in (out.stdout + out.stderr).lower()
