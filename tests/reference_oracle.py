"""Loader for the reference's *literal* torch modules, used as parity oracles.

The reference at /root/reference is a plain directory, not an installed
package; its model modules use relative imports (`from .position_encodings
import ...`).  We synthesize a ``refpkg`` package whose subpackages point at
the reference directories so the stock import machinery resolves those
relative imports, then exec the target file under its dotted name.

This removes the hand-retyped-torch-double risk: a shared misreading of the
reference can no longer make a parity test pass (VERDICT round-1 missing #2).

Only pure-torch modules are loadable this way; the full models additionally
need torchvision/diffusers/CLIP which are absent in this image — those keep
their builder-authored doubles (tests/test_backbone_parity.py et al).
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def _ensure_pkg(name: str, path: Path):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [str(path)]
    sys.modules[name] = mod
    return mod


def load_reference_module(dotted: str):
    """Load e.g. 'model.utils.position_encodings' from /root/reference."""
    full = "refpkg." + dotted
    if full in sys.modules:
        return sys.modules[full]
    _ensure_pkg("refpkg", REFERENCE_ROOT)
    parts = dotted.split(".")
    for i in range(1, len(parts)):
        _ensure_pkg(
            "refpkg." + ".".join(parts[:i]),
            REFERENCE_ROOT.joinpath(*parts[:i]),
        )
    path = REFERENCE_ROOT.joinpath(*parts).with_suffix(".py")
    spec = importlib.util.spec_from_file_location(full, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_position_encodings():
    return load_reference_module("model.utils.position_encodings")


def ref_multihead_custom_attention():
    return load_reference_module("model.utils.multihead_custom_attention")


def ref_layers():
    return load_reference_module("model.utils.layers")


def ref_model_utils():
    return load_reference_module("model.utils.utils")


def ref_pytorch3d_transforms():
    return load_reference_module("utils.pytorch3d_transforms")
