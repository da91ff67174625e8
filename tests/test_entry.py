"""Regression tests for the driver entry points (__graft_entry__.py).

Round-1 shipped a dryrun_multichip that assumed jax.devices() already had
n_devices entries and crashed under the driver (MULTICHIP_r01.json rc=1).
These tests import the actual entry module and exercise the same call the
driver makes, so the contract can't silently regress again.
"""
import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


def test_entry_surface():
    """Both driver hooks exist with the documented signatures."""
    assert callable(__graft_entry__.entry)
    assert callable(__graft_entry__.dryrun_multichip)


def test_ensure_devices_in_process():
    """Under the test conftest the 8-device CPU mesh is already live, so the
    bootstrap must accept it in-process (no subprocess delegation)."""
    assert __graft_entry__._ensure_devices(8) is True
    assert len(jax.devices()) >= 8


@pytest.mark.slow
def test_dryrun_multichip_runs():
    """The exact driver call: one full sharded train step on an 8-device mesh."""
    __graft_entry__.dryrun_multichip(8)
