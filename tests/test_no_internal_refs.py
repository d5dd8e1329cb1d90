"""Guard against internal-tooling references leaking into the public
source tree (r5 verdict item 2: a comment cited a builder-harness path).
Only public artifacts may be referenced: the PySpark/DuckDB APIs, the
reference repo's file:line citations, and this repo's own files."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Patterns that should never appear in shipped source or docs.
FORBIDDEN = [
    re.compile(r"\.claude\b"),
    re.compile(r"\bskills?/verify\b"),
    re.compile(r"\bCLAUDE\.md\b"),
]

SCAN_GLOBS = ["streamy_db_spark/**/*.py", "tests/*.py", "*.py", "README.md"]


def test_no_internal_tooling_references():
    hits = []
    for pattern in SCAN_GLOBS:
        for path in REPO.glob(pattern):
            if path.name == "test_no_internal_refs.py":
                continue
            text = path.read_text(encoding="utf-8", errors="replace")
            for rx in FORBIDDEN:
                for m in rx.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    hits.append(f"{path.relative_to(REPO)}:{line}: {m.group(0)}")
    assert not hits, "internal-tooling references found:\n" + "\n".join(hits)
