"""Load modules of the read-only PyTorch reference as golden test oracles.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT and is never
copied into this repo; tests import selected numeric modules (pure torch math,
no side effects) to verify that our TPU-native reimplementation matches the
reference semantics. All uses skip gracefully when the reference or torch is
unavailable.
"""

import importlib.util
import os

import pytest

REFERENCE_ROOT = "/root/reference"


def load_reference_module(rel_path, name):
    path = os.path.join(REFERENCE_ROOT, rel_path)
    if not os.path.exists(path):
        pytest.skip(f"reference module {rel_path} not available")
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch not available")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
