"""Executes every ```python code block in the docs, in order, in one shared
namespace per file — the documentation equivalent of the reference's
``README_process.py`` discipline: examples that don't run don't ship."""

import pathlib
import re
import textwrap

import pytest

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs"

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(name):
    text = (DOCS / name).read_text()
    # Dedent: blocks nested under list items are indented in the source.
    return [textwrap.dedent(b) for b in _BLOCK_RE.findall(text)]


@pytest.mark.parametrize("doc", ["manual.md", "scaling.md"])
def test_doc_code_blocks_run(doc):
    blocks = _blocks(doc)
    assert blocks, f"no python blocks found in {doc}"
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{doc}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - diagnostic
            raise AssertionError(
                f"{doc} block {i} failed: {e}\n--- block ---\n{block}"
            ) from e
