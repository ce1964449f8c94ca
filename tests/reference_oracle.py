"""Load modules of the read-only PyTorch reference as golden test oracles.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT and is never
copied into this repo; tests import selected numeric modules (pure torch math,
no side effects) to verify that our TPU-native reimplementation matches the
reference semantics. All uses skip gracefully when the reference or torch is
unavailable.
"""

import importlib
import importlib.util
import os
import sys

import pytest

REFERENCE_ROOT = "/root/reference"


def load_reference_package(module_name):
    """Import a reference module as part of its real package tree.

    ``load_reference_module`` loads single files in isolation; model-level
    oracles (the per-stage loss-graph tests) need the reference's *packages*
    (``models.*`` with their relative imports and ``util.*``), so the
    reference root goes on sys.path. The reference has no top-level package
    name that collides with ours (``desr_tpu``) or the test tree.
    """
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference not available")
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch not available")
    if REFERENCE_ROOT not in sys.path:
        # APPEND, never prepend: the reference tree has top-level main.py /
        # data / options modules that would otherwise shadow ours for any
        # test that runs after an oracle test in the same process (caught:
        # `import main` in test_cli_integration resolved to the REFERENCE
        # main.py when oracle tests ran first)
        sys.path.append(REFERENCE_ROOT)
    try:
        return importlib.import_module(module_name)
    except ImportError as e:  # e.g. a reference dep missing in this env
        pytest.skip(f"reference package {module_name} not importable: {e}")


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
