"""Regenerate SURVEY.md §2.3 (the declared-query index) from the live
registry, so the builder-maintained contract artifact can never drift
from plans/queries.py again. Prints the replacement section to stdout;
`--write` splices it into SURVEY.md in place (between the '### 2.3'
header and the next '## ' heading).

Usage: python tools/gen_query_index.py [--write]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = [
    ("q", "Relational / TPC-H / sketch queries"),
    ("tx", "Text & corpus curation"),
    ("em", "Embeddings / ANN / clustering"),
    ("mm", "Multimodal codecs & probes"),
    ("gen", "Generators"),
    ("ev", "Evaluation metrics & pipelines"),
    ("st", "Structured Streaming duals"),
]


def family(name: str) -> str:
    m = re.match(r"([a-z]+)\d", name)
    return m.group(1) if m else "q"


def one_liner(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return "(no docstring)"
    text = " ".join(doc.split())
    return text[:117] + "..." if len(text) > 120 else text


def build_section() -> str:
    from paqarin_spark.plans import queries as q

    n = len(q.QUERIES)
    n_oracle = len(q.ORACLE_SQL)
    rows_only = sorted(set(q.QUERIES) - set(q.ORACLE_SQL))
    lines = [
        "### 2.3 Declared query index (builder-maintained, regenerate "
        "per round)",
        "",
        "Regenerated mechanically: `python tools/gen_query_index.py "
        "--write`.",
        "",
        f"{n} queries, {n_oracle} value-oracled "
        f"({', '.join(rows_only)} rows-only by design).",
    ]
    grouped: dict[str, list[tuple[int, str]]] = {}
    for name, fn in q.QUERIES.items():
        m = re.match(r"[a-z]+(\d+)", name)
        num = int(m.group(1)) if m else 0
        grouped.setdefault(family(name), []).append(
            (num, f"- `{name}` — {one_liner(fn)}")
        )
    grouped = {
        k: [line for _, line in sorted(v)] for k, v in grouped.items()
    }
    for key, title in FAMILIES:
        entries = grouped.pop(key, [])
        if not entries:
            continue
        lines += ["", f"**{title}** ({len(entries)}):", ""]
        lines += entries
    for key, entries in sorted(grouped.items()):
        lines += ["", f"**Other ({key})** ({len(entries)}):", ""]
        lines += entries
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    section = build_section()
    survey = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SURVEY.md")
    if "--write" in sys.argv:
        text = open(survey).read()
        start = text.index("### 2.3 ")
        end = text.index("\n## ", start)
        open(survey, "w").write(text[:start] + section + text[end:])
        print(f"SURVEY.md §2.3 regenerated ({section.count(chr(10))} lines)")
    else:
        print(section)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
