"""API-surface contract vs the reference: drop-in compatibility, pinned.

Parses the reference's own source (AST only — it cannot be imported here)
and asserts our public surface is a superset: every `Separator.__init__`
kwarg and every CLI flag a reference user could pass must exist here too.
Skipped when the reference checkout is unavailable.
"""

import ast
import os

import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "audio_separator")),
    reason="reference checkout unavailable")


def _init_kwargs(path: str, class_name: str):
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == class_name:
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name == "__init__":
                    return ([a.arg for a in item.args.args[1:]]
                            + [a.arg for a in item.args.kwonlyargs])
    raise AssertionError(f"{class_name}.__init__ not found in {path}")


def test_separator_kwargs_cover_reference():
    ref = _init_kwargs(
        os.path.join(REF_ROOT, "audio_separator/separator/separator.py"),
        "Separator")
    ours = _init_kwargs(
        os.path.join(os.path.dirname(__file__), "..",
                     "audio_separator_tpu/separator/separator.py"),
        "Separator")
    missing = [k for k in ref if k not in ours]
    assert not missing, f"Separator kwargs missing vs reference: {missing}"


def _argparse_flags(path: str):
    """All option strings passed to add_argument in a file (AST literal scan)."""
    flags = set()
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            for arg in node.args:
                if isinstance(arg, ast.Constant) and isinstance(arg.value, str) \
                        and arg.value.startswith("-"):
                    flags.add(arg.value)
    return flags


def test_cli_flags_cover_reference():
    ref = _argparse_flags(os.path.join(REF_ROOT, "audio_separator/utils/cli.py"))
    ours = _argparse_flags(
        os.path.join(os.path.dirname(__file__), "..",
                     "audio_separator_tpu/utils/cli.py"))
    missing = sorted(f for f in ref if f not in ours)
    assert not missing, f"CLI flags missing vs reference: {missing}"
