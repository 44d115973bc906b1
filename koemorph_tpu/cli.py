"""Console-script entry points (pyproject [project.scripts]).

The implementations live in scripts/ (runnable directly); these shims make
them importable after `pip install .` (reference console scripts
koemorph-train / koemorph-rt, pyproject.toml:45-47).
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"


def _run(script_name: str) -> int:
    path = _SCRIPTS / script_name
    spec = importlib.util.spec_from_file_location(script_name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main()


def rt_main() -> int:
    return _run("rt.py")


def rt_simplified_main() -> int:
    return _run("rt_simplified.py")


def infer_main() -> int:
    return _run("infer.py")


def export_main() -> int:
    return _run("export_model.py")


def serve_main() -> int:
    return _run("serve.py")


if __name__ == "__main__":  # pragma: no cover
    sys.exit(rt_main())
