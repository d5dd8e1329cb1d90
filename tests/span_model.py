"""Independent Python model of the span-merge rule (overlapping-or-
adjacent per-doc intervals), shared by every suite that checks the
ExactSubstr family's equality bar. ONE copy on purpose (r11 review:
two verbatim copies meant one could silently drift and stop being an
independent check of the JVM fold)."""

from __future__ import annotations


def merge_spans_model(spans) -> set:
    """{(doc, start, end)} → maximal merged spans per doc. The merge
    rule depends only on token coverage, so merging pre-merged
    per-batch spans equals merging the raw hit windows."""
    out: set = set()
    by_doc: dict = {}
    for d, s, e in spans:
        by_doc.setdefault(d, []).append((s, e))
    for d, ivs in by_doc.items():
        ivs.sort()
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s <= cur_e + 1:
                cur_e = max(cur_e, e)
            else:
                out.add((d, cur_s, cur_e))
                cur_s, cur_e = s, e
        out.add((d, cur_s, cur_e))
    return out
