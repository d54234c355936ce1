"""Regenerate COVERAGE.md's driver-contract query table from the actual
QUERIES / ORACLES registries, so the contract can't drift from the docs
(a test asserts the committed section equals a fresh render). Usage:

    python tools/gen_coverage.py          # rewrite COVERAGE.md in place
    python tools/gen_coverage.py --check  # exit 1 if the file is stale
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COVERAGE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
BEGIN = "<!-- BEGIN GENERATED: driver-contract queries (tools/gen_coverage.py) -->"
END = "<!-- END GENERATED -->"


def render_section():
    from osm_export_tool_python_ray.pipelines.queries import (
        EXPORT_SURFACE_ORACLE_KEYS,
        ORACLES,
        QUERIES,
    )

    lines = [
        BEGIN,
        "",
        "## Driver-contract queries (generated — do not edit by hand)",
        "",
        "One row per `queries()` entry; `oracle` says how the driver's",
        "correctness gate checks it (`static SQL` = constant in `ORACLES`,",
        "`generated SQL` = built per-corpus by `export_surface_oracles()`).",
        "",
        "| # | query | implementation | oracle |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        mod = fn.__module__.replace("osm_export_tool_python_ray", "pkg")
        if name in ORACLES:
            oracle = "static SQL"
        elif name in EXPORT_SURFACE_ORACLE_KEYS:
            oracle = "generated SQL"
        else:
            oracle = "rows-only"
        lines.append("| %d | `%s` | `%s.%s` | %s |" % (i, name, mod, fn.__name__, oracle))
    n_oracle = sum(
        1 for n in QUERIES if n in ORACLES or n in EXPORT_SURFACE_ORACLE_KEYS
    )
    lines += [
        "",
        "**%d queries, %d oracle-backed.**" % (len(QUERIES), n_oracle),
        "",
        END,
    ]
    return "\n".join(lines)


def main():
    with open(COVERAGE) as f:
        text = f.read()
    section = render_section()
    pattern = re.compile(re.escape(BEGIN) + ".*?" + re.escape(END), re.DOTALL)
    if pattern.search(text):
        new = pattern.sub(lambda _: section, text)
    else:
        new = text.rstrip() + "\n\n" + section + "\n"
    if "--check" in sys.argv:
        if new != text:
            print("COVERAGE.md is stale — run: python tools/gen_coverage.py")
            sys.exit(1)
        print("COVERAGE.md is current")
        return
    with open(COVERAGE, "w") as f:
        f.write(new)
    n = sum(1 for ln in section.splitlines() if ln.startswith("| ") and "---" not in ln) - 1
    print("COVERAGE.md updated (%d queries)" % n)


if __name__ == "__main__":
    main()
