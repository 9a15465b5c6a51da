"""Champion extraction (scripts/store_champions.py): a campaign
checkpoint's hall of fame round-trips into results/evolved_champions.json
as re-parseable grammar strings — the native counterpart of the
reference's gpem-21-results artifacts that
scripts/evaluate_evolved_solver.py re-measures."""

import json
import pathlib
import subprocess
import sys

import pytest

from evostencils_tpu.optimization.program import CheckPoint
from evostencils_tpu.grammar import gp

ROOT = pathlib.Path(__file__).resolve().parents[1]


class _Fit:
    def __init__(self, values):
        self.values = tuple(values)
        self.valid = True


class _Ind:
    """Minimal picklable stand-in for gp.Individual in a checkpoint."""

    def __init__(self, s, values):
        self._s = s
        self.fitness = _Fit(values)

    def __str__(self):
        return self._s


def test_store_champions_roundtrip(tmp_path, monkeypatch):
    pop = [
        _Ind("cycle(a)", (0.5, 2.0)),
        _Ind("cycle(b)", (0.1, 3.0)),
        _Ind("cycle(b)", (0.1, 3.0)),        # duplicate grammar: dropped
        _Ind("cycle(c)", (1e99, 1e99)),      # infinite fitness: dropped
    ]
    cp = CheckPoint(min_level=3, max_level=7, generation=12,
                    finished_chunks=[], population=pop, logbooks=[],
                    hof_items=pop)
    ckpt = tmp_path / "checkpoint.p"
    cp.dump_to_file(str(ckpt))

    out_dir = tmp_path / "results"
    out_dir.mkdir()
    (out_dir / "evolved_champions.json").write_text(
        json.dumps({"existing": [{"grammar": "keepme"}]}))

    # run the tool against a scratch copy of the repo root layout
    script = (ROOT / "scripts" / "store_champions.py").read_text()
    script = script.replace(
        "ROOT = pathlib.Path(__file__).resolve().parents[1]",
        f"ROOT = pathlib.Path({str(tmp_path)!r})")
    tool = tmp_path / "store_champions.py"
    tool.write_text(script)
    res = subprocess.run(
        [sys.executable, str(tool), "--ckpt", str(ckpt),
         "--key", "test_key", "--top", "4"],
        capture_output=True, text=True,
        env={"PYTHONPATH": str(ROOT), "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu"})
    assert res.returncode == 0, res.stderr

    data = json.loads((out_dir / "evolved_champions.json").read_text())
    assert data["existing"] == [{"grammar": "keepme"}]   # preserved
    entries = data["test_key"]
    assert [e["grammar"] for e in entries] == ["cycle(b)", "cycle(a)"]
    assert entries[0]["fitness_rho"] == pytest.approx(0.1)
    assert entries[0]["fitness_ms_per_iter"] == pytest.approx(3.0)


def test_stored_champions_reparse():
    """Every grammar string already shipped in results/ re-parses against
    a freshly built primitive set of its own problem family (the
    reference's re-measurement contract, evaluate_evolved_solver.py)."""
    from evostencils_tpu.grammar.multigrid import generate_primitive_set

    champs = json.loads(
        (ROOT / "results" / "evolved_champions.json").read_text())

    def pset_for(key):
        if key.startswith("poisson2d_1023sq"):
            from evostencils_tpu.problems.poisson import poisson_2d
            p = poisson_2d(max_level=10, min_level=5)
            kw = {}
        elif key.startswith("helmholtz_split"):
            from evostencils_tpu.problems.helmholtz import helmholtz_2d_split
            p = helmholtz_2d_split(max_level=7, min_level=3, k=80.0)
            kw = {"coupled_fields": True}
        elif key.startswith("fas2d"):
            from evostencils_tpu.problems.fas import fas_2d_basic
            p = fas_2d_basic(max_level=10, min_level=6)
            kw = {"FAS": True}
        elif key.startswith("elasticity2d"):
            from evostencils_tpu.problems.elasticity import (
                linear_elasticity_2d)
            p = linear_elasticity_2d(max_level=8, min_level=4)
            kw = {}
        else:
            return None
        pset, _ = generate_primitive_set(
            p.approximation, p.rhs_entity, p.level_contexts,
            p.coarsest_operator, **kw)
        return pset

    checked = 0
    for key, entries in champs.items():
        pset = pset_for(key)
        if pset is None:
            pytest.fail(f"unknown champion family: {key}")
        for e in entries[:2]:
            tree = gp.parse_tree(e["grammar"], pset)
            assert gp.compile_tree(tree, pset)[0] is not None
            checked += 1
    assert checked >= 2
