"""docs/API.md is executable documentation: every ```python block runs.

Extracts the fenced python blocks in order and execs them in one shared
namespace, so later blocks can use names defined by earlier ones exactly
as a reader following the page would. Keeps the published snippets honest
(reference analog: the README usage commands, which test_train.py parses
verbatim)."""

import os
import re

import pytest

pytestmark = pytest.mark.slow

DOC = os.path.join(os.path.dirname(__file__), os.pardir, "docs", "API.md")


def _blocks():
    with open(DOC, encoding="utf-8") as f:
        text = f.read()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)
    assert len(blocks) >= 5, "API.md lost its executable examples"
    return blocks


def test_api_md_blocks_execute_in_order(tmp_path, monkeypatch):
    # any relative paths / tempfiles a snippet makes land under pytest's tmp
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # re-read TMPDIR
    ns = {}
    for i, src in enumerate(_blocks()):
        try:
            exec(compile(src, f"{DOC}#block{i + 1}", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure formatting
            raise AssertionError(
                f"docs/API.md block {i + 1} failed: {e}\n--- block ---\n{src}"
            ) from e
    tempfile.tempdir = None  # don't leak the patched default
