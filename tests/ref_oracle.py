"""Helper to run the reference C++ binaries as parity oracles in tests.

The binaries are built out-of-tree from the read-only reference checkout the
first time they're needed; tests skip gracefully if neither the source nor a
prebuilt directory is available.
"""

from __future__ import annotations

import os
import subprocess

import pytest

REF_SRC = os.environ.get("DYNAMONT_REFERENCE_SRC", "/root/reference")
BUILD_DIR = os.environ.get(
    "DYNAMONT_REFERENCE_BUILD", os.path.join(os.path.dirname(__file__), "..", ".refbuild")
)
REF_MODEL_RNA002 = os.path.join(REF_SRC, "models/rna/rna002/rna002_5mer.model")


def reference_binary(name: str) -> str:
    path = os.path.join(BUILD_DIR, name)
    if os.path.exists(path):
        return path
    if not os.path.exists(os.path.join(REF_SRC, "CMakeLists.txt")):
        pytest.skip("reference source not available for parity oracle")
    subprocess.run(
        ["cmake", "-S", REF_SRC, "-B", BUILD_DIR, "-DCMAKE_BUILD_TYPE=Release"],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", BUILD_DIR, "-j4", "--target", name],
        check=True, capture_output=True,
    )
    return path


def run_reference(name: str, signal_text: str, read: str, extra_args=(), model=None):
    """Feed one read through a reference binary; returns CompletedProcess."""
    model = model or REF_MODEL_RNA002
    if not os.path.exists(model):
        pytest.skip(f"reference model missing: {model}")
    binary = reference_binary(name)
    return subprocess.run(
        [binary, "-m", model, "-r", "rna002", *extra_args],
        input=signal_text + "\n" + read + "\n",
        capture_output=True,
        text=True,
    )
