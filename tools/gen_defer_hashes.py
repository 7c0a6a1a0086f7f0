"""Regenerate the _DEFER_HASHES block in __spark_entry__.py.

Run after deliberately changing a deferred query (then move that query
back into the graded head — a changed query may not keep riding an old
round's green row).

    python tools/gen_defer_hashes.py
"""

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as m  # noqa: E402

ENTRY = "/root/repo/__spark_entry__.py"


def main() -> None:
    lines = ["_DEFER_HASHES: dict[str, str] = {"]
    for name in m._DEFER_TO_TAIL:
        lines.append(f'    "{name}": "{m._defer_fingerprint(name)}",')
    lines.append("}")
    block = "\n".join(lines)
    src = open(ENTRY).read()
    new, n = re.subn(
        r"_DEFER_HASHES: dict\[str, str\] = \{[^}]*\}",
        block,
        src,
        count=1,
        flags=re.S,
    )
    assert n == 1, "could not locate the _DEFER_HASHES block"
    open(ENTRY, "w").write(new)
    print(f"wrote {len(m._DEFER_TO_TAIL)} fingerprints")


if __name__ == "__main__":
    main()
