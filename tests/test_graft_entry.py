"""Driver-entry coverage: dryrun_multichip executes a real dp x tp training
step on the virtual 8-device CPU mesh (the driver's multi-chip gate)."""

import importlib.util
import os

import pytest


def _load_graft():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_dryrun_multichip_8():
    _load_graft().dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2():
    _load_graft().dryrun_multichip(2)
