"""Regenerate QUERIES.md — the registry catalog.

    python jobs/gen_query_docs.py

One row per registry query: name, defining module, and the first sentence
of its docstring. tests/test_registry.py asserts the file lists every
registry name, so adding a query without re-running this fails fast.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# registry entries defined as lambdas over shared helpers carry no
# docstring of their own; describe them here
LAMBDA_DESCRIPTIONS = {
    "rollup_t1": "Tier-1 (window=2) tumbling rollup rows per sequence,"
                 " integer-exact against the window SQL.",
    "rollup_t3": "Tier-3 (window=8) tumbling rollup rows per sequence,"
                 " integer-exact against the window SQL.",
    "rollup_t6": "Tier-6 (window=64) tumbling rollup rows per sequence,"
                 " integer-exact against the window SQL.",
    "roundtrip_haar": "All-true invariant: Haar decompose -> reconstruct"
                      " returns the exact input tokens per sequence.",
    "roundtrip_db4": "All-true invariant: DB4 decompose -> reconstruct"
                     " returns the exact input tokens per sequence.",
    "dwt_db4": "DB4 coefficient pyramid per sequence with the Parseval"
               " energy + pow2-count value oracle.",
}


def first_sentence(doc: str | None) -> str:
    if not doc:
        return "(no docstring)"
    text = " ".join(doc.split())
    for stop in (". ", " — ", " -- "):
        if stop in text:
            return text.split(stop, 1)[0].rstrip(".") + "."
    return text[:160]


def main() -> None:
    from wavelet_decomposition_ray.pipelines.data_queries import DATA_QUERIES
    from wavelet_decomposition_ray.pipelines.queries import CORE_QUERIES

    rows = []
    for module, reg in (("pipelines/queries.py", CORE_QUERIES),
                        ("pipelines/data_queries.py", DATA_QUERIES)):
        for name, (fn, sql) in reg.items():
            desc = LAMBDA_DESCRIPTIONS.get(name) or first_sentence(fn.__doc__)
            rows.append((name, module, desc, "yes" if sql else "—"))

    out = os.path.join(os.path.dirname(__file__), "..", "QUERIES.md")
    with open(out, "w") as f:
        f.write("# Query registry\n\n")
        f.write(f"{len(rows)} queries; every one exposed via "
                "`__ray_entry__.queries()` and (when `oracle` = yes) "
                "value-checked against its DuckDB SQL twin by the driver "
                "gate and `tests/test_queries_vs_duckdb.py`.\n\n")
        f.write("Regenerate with `python jobs/gen_query_docs.py`.\n\n")
        f.write("| query | module | what it does | oracle |\n")
        f.write("|---|---|---|---|\n")
        for name, module, desc, has_sql in sorted(rows):
            desc = desc.replace("|", "\\|")
            f.write(f"| `{name}` | {module} | {desc} | {has_sql} |\n")
    print(f"wrote {out}: {len(rows)} queries")


if __name__ == "__main__":
    main()
