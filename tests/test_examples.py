"""Smoke-run every script in examples/: each must execute end-to-end and
print output. The statistical assertions for the same workflows live in
tests/test_readme_examples.py; this gate keeps the user-facing scripts
executable as the API evolves."""

import pathlib
import runpy

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("example*.py"),
    key=lambda p: int("".join(c for c in p.stem.split("_")[0] if c.isdigit())),
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(path, capsys):
    runpy.run_path(str(path), run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{path.name} printed nothing"
