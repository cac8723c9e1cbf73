"""Import smoke for the examples surface: every example module must at
least parse and import (their ``main()`` bodies run Spark end-to-end
and are exercised manually / in round notes, but an import-time
NameError or a moved operator should fail CI, not the first user).
Imports only -- the ``__main__`` guard keeps Spark from starting."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted(
    (Path(__file__).resolve().parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_imports(path):
    name = f"_example_smoke_{path.stem}"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
        assert hasattr(mod, "main"), f"{path.name} has no main()"
    finally:
        sys.modules.pop(name, None)
