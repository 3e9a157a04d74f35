"""Execute every ```python code block in the repo's documentation — the
analog of the reference's doc-snippet discipline (tfhe/src/test_user_docs.rs
+ tasks/ doc coverage check): examples in README.md must actually run."""

import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
DOCS = [ROOT / "README.md"]


def _python_blocks(path):
    text = path.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


_cases = [(doc.name, i, block)
          for doc in DOCS if doc.exists()
          for i, block in enumerate(_python_blocks(doc))]


def test_docs_have_snippets():
    assert len(_cases) >= 2, "README lost its runnable examples"


@pytest.mark.parametrize("doc,i,block", _cases,
                         ids=[f"{d}#{i}" for d, i, _ in _cases])
def test_doc_snippet_runs(doc, i, block):
    # snippets share one namespace per document in order, like a REPL
    ns = _doc_namespaces.setdefault(doc, {})
    exec(compile(block, f"{doc}#snippet{i}", "exec"), ns)


_doc_namespaces: dict = {}
