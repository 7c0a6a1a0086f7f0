"""Regenerate the current-surface index at the top of COVERAGE.md
(VERDICT r10 directive 9).

For every registered query: the module of the operator it exercises
(the query fn's first package import, best-effort), its position class
(graded head / deferred / past-window), and the latest round whose
CORRECTNESS_r{N}.json records it fully green (rows+schema+hash, or
rows-only for oracle-less queries).

    python tools/gen_coverage_index.py
"""

import glob
import inspect
import json
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as m  # noqa: E402

COVERAGE = "/root/repo/COVERAGE.md"
BEGIN = "<!-- BEGIN GENERATED SURFACE INDEX -->"
END = "<!-- END GENERATED SURFACE INDEX -->"


def last_green() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        rows = json.load(open(path))
        for name, r in rows.items():
            ok = r.get("rows_match") and r.get("err") is None
            if "hash_match" in r and r["hash_match"] is not None:
                ok = ok and r.get("schema_match") and r.get("hash_match")
            if ok:
                out[name] = max(out.get(name, 0), rnd)
    return out


# the module-level import aliases in __spark_entry__.py (kept in sync
# by hand; regex requires the literal dot so "S." never fires on "SK.")
_ALIASES = {
    "T": "operators.textops", "A": "operators.aggregates",
    "D": "operators.dedup", "K": "operators.kernels",
    "M": "operators.multimodal", "V": "operators.similarity",
    "SK": "operators.sketches", "C": "functions.cleaning",
    "S": "functions.strings",
}


def module_of(name: str) -> str:
    src = inspect.getsource(m._QUERIES[name])
    hits = {
        x.rstrip(".")
        for x in re.findall(r"from gem_data_wrangle_spark\.(\S+) import", src)
    }
    hits |= {
        mod
        for alias, mod in _ALIASES.items()
        if re.search(rf"(?<![A-Za-z_]){alias}\.", src)
    }
    return ", ".join(sorted(hits)) if hits else "__spark_entry__"


def main() -> None:
    green = last_green()
    names = list(m.queries())
    head = set(names[:50])
    deferred = set(m._DEFER_TO_TAIL)
    lines = [
        BEGIN,
        "",
        "## Current surface index (generated — tools/gen_coverage_index.py)",
        "",
        f"{len(names)} registered queries; the driver grades the first 50",
        "(insertion order after rotation). **last green** = newest round",
        "whose CORRECTNESS_r{N}.json records rows+schema+hash all true",
        "(rows-only for oracle-less queries); `-` = registered since the",
        "last grading or never inside the window (pytest + local parity",
        "carry it, see the ledger below).",
        "",
        "| query | operator module(s) | position | last green |",
        "|---|---|---|---|",
    ]
    for n in names:
        pos = (
            "graded head" if n in head
            else "deferred (fingerprint-pinned)" if n in deferred
            else "past window"
        )
        lg = f"r{green[n]:02d}" if n in green else "-"
        lines.append(f"| {n} | {module_of(n)} | {pos} | {lg} |")
    lines += ["", END]
    block = "\n".join(lines)
    src = open(COVERAGE).read()
    if BEGIN in src:
        new = re.sub(
            re.escape(BEGIN) + ".*?" + re.escape(END), block, src, flags=re.S
        )
    else:
        # insert after the H1 intro paragraph (first blank-line gap
        # following the opening prose)
        head_md, rest = src.split("\n## ", 1)
        new = head_md + "\n" + block + "\n\n## " + rest
    open(COVERAGE, "w").write(new)
    n_green = sum(1 for n in names if n in green)
    print(f"indexed {len(names)} queries ({n_green} with a driver-green row)")


if __name__ == "__main__":
    main()
