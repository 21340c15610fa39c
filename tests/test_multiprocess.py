"""REAL multi-process distributed test: 2 OS processes x 4 CPU devices
coordinated by jax.distributed (grpc collectives over the loopback —
the DCN analogue).  The single-process 8-virtual-device run is the
oracle.  This is the SURVEY §2.3 'new first-class component' promise:
the reference has no distributed story at all."""

import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse(out: str) -> dict:
    vals = {}
    for key in ("LOSS", "HALO", "BINNED"):
        m = re.search(rf"^{key} ([-0-9.e+]+)$", out, re.M)
        assert m, f"{key} line missing in:\n{out}"
        vals[key] = float(m.group(1))
    return vals


def test_two_process_matches_single_process():
    worker = Path(__file__).parent / "mp_worker.py"
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(_parse(out))
    # Both processes see identical replicated scalars.
    assert outs[0] == outs[1], outs

    # Single-process oracle (1 process, 8 virtual devices).
    sp = subprocess.run(
        [sys.executable, str(worker), "0", "1", str(_free_port())],
        capture_output=True, text=True, timeout=420)
    assert sp.returncode == 0, sp.stderr[-3000:]
    single = _parse(sp.stdout)
    np.testing.assert_allclose(outs[0]["LOSS"], single["LOSS"],
                               rtol=1e-4)
    np.testing.assert_allclose(outs[0]["HALO"], single["HALO"],
                               rtol=1e-4)
    np.testing.assert_allclose(outs[0]["BINNED"], single["BINNED"],
                               rtol=1e-4)
