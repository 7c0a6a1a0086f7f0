"""EXAMPLES.md drift guard: every `from gem_data_wrangle_spark...`
import inside the doc's code blocks must still resolve to a real
symbol. The recipes are the package's public front door — a renamed
operator that silently breaks them is doc rot this catches at commit
time. (Full execution is out of scope: the snippets reference
illustrative /data paths.)"""

from __future__ import annotations

import importlib
import re

EXAMPLES = "/root/repo/EXAMPLES.md"

_IMPORT = re.compile(
    r"^from (gem_data_wrangle_spark[\w.]*) import \(?([\w, \n]+?)\)?$",
    re.M,
)


def _doc_imports():
    text = open(EXAMPLES).read()
    blocks = re.findall(r"```python\n(.*?)```", text, re.S)
    assert blocks, "EXAMPLES.md lost its python blocks?"
    seen = []
    for block in blocks:
        # join parenthesized multi-line imports before matching
        joined = re.sub(r"\(\s*\n\s*", "(", block)
        joined = re.sub(r",\s*\n\s*", ", ", joined)
        for mod, names in _IMPORT.findall(joined):
            for name in names.split(","):
                name = name.strip().rstrip(")")
                if name:
                    # "x as y" binds y locally; the real symbol is x
                    seen.append((mod, name.split(" as ")[0].strip()))
    return seen


def test_examples_imports_resolve():
    pairs = _doc_imports()
    assert len(pairs) >= 25, f"suspiciously few doc imports: {len(pairs)}"
    missing = []
    for mod, name in pairs:
        try:
            module = importlib.import_module(mod)
        except ImportError:
            missing.append(f"{mod} (module)")
            continue
        if not hasattr(module, name):
            # `from pkg import x` also resolves x as a SUBMODULE even
            # when pkg/__init__ does not import it — mirror that
            try:
                importlib.import_module(f"{mod}.{name}")
            except ImportError:
                missing.append(f"{mod}.{name}")
    assert not missing, f"EXAMPLES.md references vanished symbols: {missing}"
