"""Console-script entry points (pyproject.toml [project.scripts]).

The reference ships a pip-installable package whose workflows are driven
by ``scripts/optimize.py`` (reference setup.py:1-12, scripts/optimize.py);
here the same drivers are importable so an installed wheel exposes
``evostencils-optimize`` and ``evostencils-bench`` without a repo
checkout.
"""

import importlib.util
import pathlib
import sys


def _load(script_name):
    # The drivers live as repo scripts; resolve them relative to the
    # installed package's parent (source checkout) or the repo root.
    root = pathlib.Path(__file__).resolve().parents[1]
    for candidate in (root / "scripts" / script_name, root / script_name):
        if candidate.exists():
            spec = importlib.util.spec_from_file_location(
                script_name.removesuffix(".py"), candidate)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod
    raise SystemExit(
        f"{script_name} not found next to the evostencils_tpu package; "
        "run from a source checkout")


def optimize_main():
    sys.exit(_load("optimize.py").main())


def bench_main():
    sys.exit(_load("bench.py").main())
