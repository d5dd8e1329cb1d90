"""Exact substring deduplication (ExactSubstr): duplicated token-window
spans across the corpus.

The published training-data op (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499):
verbatim substrings repeated across documents — boilerplate, licenses,
templated passages — drive memorization even when the documents as a
whole are not near-duplicates, so pipelines locate and cut the repeated
SPANS rather than whole docs. The paper builds a suffix array; the
Spark-native shape is rolling token windows: every W-token window is
hashed scan-side, a window whose hash appears in ≥ 2 distinct docs is
duplicated, and per doc the hit windows merge into maximal token-index
spans.

Scale shape: window generation is a JVM ``transform``/``slice`` over
the token array — one scan, no Python, no explode of text (the shuffle
moves an (8 B xxhash64, doc_id, pos) row per window, never tokens).
The fingerprint is internal — it never reaches the output spans — so
the DuckDB oracle groups windows by their raw text instead of
mirroring the hash (the portable-oracle pattern proven in
decontam.py; r10 verdict item 1 swapped the original 32-hex md5 key,
which quadrupled the shuffle weight of the pipeline's single largest
intermediate). One shuffle
groups window fingerprints (uniform 64-bit keys), one more groups hits per doc;
the interval merge is a JVM ``aggregate`` fold over the per-doc sorted
hit list. O(total tokens) windows — the same asymptotics as the
suffix-array construction the paper shards, with Spark handling the
sharding. Everything is whole-stage-codegen JVM (plan-gated: zero
Python evaluation nodes).

No reference counterpart (SURVEY.md §2.3 — no text surface); extends
the dedup family (exact / MinHash / SimHash / semantic / substring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.operators.decontam import WS_RE, ngram_keys, tokens
from streamy_db_spark.sources.tables import load_table

#: Window width in TOKENS. The paper uses 50 BPE tokens; the
#: whitespace-token default here is sized to the harness fixtures
#: (planted duplicate passages are sentence-scale). A span must contain
#: a full W-token verbatim repeat to fire — raise for production
#: corpora to taste.
SUBSTR_WINDOW = 8


def _window_hashes(docs: DataFrame, window: int, id_col: str) -> DataFrame:
    """(id, pos, h): 64-bit xxhash64 of every ``window``-token rolling
    window, 0-based token position. Reuses decontam.ngram_keys for the
    windowing+keying rule (one maintained copy — r9 review; r13 swaps
    the per-window string build for hashing the token slice directly,
    see ngram_keys); docs shorter than one window yield an empty key
    array, which posexplode drops. The 8 B long key is the frame's
    whole shuffle payload per window (plus id+pos); a collision merges
    two distinct windows with probability ~|windows|²/2⁶⁵ — vanishing
    at corpus scale and conservative in direction (it can only ADD a
    span, the anti-memorization side). The key is internal to a run:
    the incremental gate's ``wins`` state stores it, so all writers of
    one state dir must share one ngram_keys version (a key-scheme
    change invalidates persisted state, exactly like a tokenizer
    change would)."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(ngram_keys(tokens(F.col("text")), window)).alias(
            "pos", "h"
        ),
    )


def _merge_intervals(ivs: Column) -> Column:
    """Fold a SORTED array<struct<pos,end>> into merged
    overlapping-or-adjacent intervals (pos <= last.end + 1) — the JVM
    twin of the oracle's gaps-and-islands window SQL."""
    empty = F.array().cast("array<struct<pos:int,end:int>>")
    last = lambda acc: F.element_at(acc, -1)  # noqa: E731
    return F.aggregate(
        ivs,
        empty,
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (x["pos"] <= last(acc)["end"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc)["pos"].alias("pos"),
                        F.greatest(last(acc)["end"], x["end"]).alias("end"),
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def duplicated_spans(
    docs: DataFrame,
    window: int = SUBSTR_WINDOW,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc maximal token spans covered by a ``window``-token
    substring that occurs verbatim in at least ``min_docs`` DISTINCT
    docs. Output: (id, start_tok, end_tok) with 0-based inclusive
    token indices; overlapping-or-adjacent hit windows merge into one
    span. Deterministic — the oracle twin is exact SQL.

    Returns an eagerly-materialized frame: the window-hash stage is
    O(total tokens) rows (one 8 B xxhash64 + id + pos per token
    position — corpus-scale), so it is persisted DISK_ONLY while the
    duplicate aggregation and the hits join both read it (they
    partition differently — h vs per-doc — so without materialization
    the whole scan would execute twice, r9 review), RELEASED before
    returning, and only the tiny per-doc span result is checkpointed.
    DISK_ONLY persist, not localCheckpoint, for the corpus-sized frame:
    persisted partitions recompute on executor loss where a local
    checkpoint is unrecoverable, and the blocks are freed by the
    explicit unpersist instead of pinning executor-local storage for
    the DataFrame's lifetime (r9 ADVICE)."""
    from pyspark.storagelevel import StorageLevel

    wins = _window_hashes(docs, window, id_col).persist(StorageLevel.DISK_ONLY)
    try:
        spans = _spans_of_windows(wins, window, min_docs, id_col)
        return spans.localCheckpoint(eager=True)
    finally:
        wins.unpersist()


def _merged_span_frame(ivs: DataFrame, id_col: str) -> DataFrame:
    """(_id, iv struct<pos,end>) rows → merged (id_col, start_tok,
    end_tok) spans. THE one copy of the fold+projection tail (r11
    review: _spans_from_hits and merge_spans each had a verbatim copy,
    which is exactly the drift the sharing exists to prevent)."""
    merged = ivs.groupBy("_id").agg(
        _merge_intervals(F.sort_array(F.collect_list("iv"))).alias("spans")
    )
    return merged.select(
        F.col("_id").alias(id_col),
        F.explode("spans").alias("s"),
    ).select(
        id_col,
        F.col("s.pos").alias("start_tok"),
        F.col("s.end").alias("end_tok"),
    )


def _spans_from_hits(hits: DataFrame, window: int, id_col: str) -> DataFrame:
    """(_id, pos) hit occurrences → merged (id_col, start_tok, end_tok)
    spans: each hit covers tokens [pos, pos+window-1], overlapping-or-
    adjacent hit windows merge per doc. Shared by the one-shot form and
    the incremental gate (incremental_substring.py), so the two can
    never drift on the merge rule — the incremental family's equality
    contract depends on both sides merging identically."""
    ivs = hits.select(
        "_id",
        F.struct(
            F.col("pos"), (F.col("pos") + window - 1).alias("end")
        ).alias("iv"),
    )
    return _merged_span_frame(ivs, id_col)


def _spans_of_windows(
    wins: DataFrame, window: int, min_docs: int, id_col: str
) -> DataFrame:
    """Lazy agg/join/merge plan from the window-hash frame — split out
    so the plan gate can inspect it before duplicated_spans materializes
    the result (a checkpointed frame would hide any Python node behind
    Scan ExistingRDD)."""
    dup = (
        wins.groupBy("h")
        .agg(F.count_distinct("_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    hits = wins.join(dup, "h").select("_id", "pos")
    return _spans_from_hits(hits, window, id_col)


def merge_spans(spans: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Canonicalize a span frame: merge each doc's overlapping-or-
    adjacent (start_tok, end_tok) spans into maximal spans — the
    consumer-side companion of the incremental gate's changelog output
    (incremental_substring.py / substring_dedup_sink): the union of all
    emitted batch directories, merged per doc with THIS function,
    equals one-shot duplicated_spans over everything ingested. Same
    JVM fold as the one-shot path (_merged_span_frame), so the two can
    never drift. Idempotent on already-canonical frames."""
    ivs = spans.select(
        F.col(id_col).alias("_id"),
        F.struct(
            F.col("start_tok").alias("pos"), F.col("end_tok").alias("end")
        ).alias("iv"),
    )
    return _merged_span_frame(ivs, id_col)


def strip_duplicated_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the spans: rebuild each doc's text with the duplicated
    token ranges removed (ALL occurrences cut — the conservative
    anti-memorization direction; a keep-one-occurrence variant needs a
    global occurrence order and is left to the caller). Docs with no
    spans pass through verbatim (original string untouched). Cleaned
    docs keep their ORIGINAL token casing: span indices were computed
    on the lowercased token view, but lowercasing changes no token
    boundaries, so the same positions index the raw token array —
    only inter-token whitespace is normalized to single spaces."""
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("_cut")
    )
    # the SAME split rule as tokens() (minus the lowercasing) — span
    # indices only align with the raw array if both sides split on the
    # one shared WS_RE constant (r9 fourth review)
    raw_toks = F.filter(F.split(F.col("text"), WS_RE), lambda x: x != "")
    kept = F.filter(
        F.transform(
            raw_toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))
        ),
        lambda s: ~F.exists(
            F.col("_cut"),
            lambda c: (s["i"] >= c["start_tok"]) & (s["i"] <= c["end_tok"]),
        ),
    )
    cleaned = F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
    out_cols = [c for c in docs.columns if c != "text"]
    return (
        docs.join(per_doc, id_col, "left")
        .withColumn(
            "text",
            F.when(F.col("_cut").isNull(), F.col("text")).otherwise(cleaned),
        )
        .select(*out_cols, "text")
    )


def q_dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr spans over the documents table (hash-checked against
    the gaps-and-islands DuckDB oracle). ``spread`` first (r13, guide
    §2.6): the sf table scans as one partition, so the O(total tokens)
    window-hash stage ran in a single task with 31 cores idle — same
    move as the minhash queries."""
    from streamy_db_spark.sources.tables import spread

    return duplicated_spans(
        spread(
            load_table(spark, sf_dir, "documents").select("doc_id", "text"),
            "doc_id",
        )
    )


def substring_oracle_sql(window: int, min_docs: int) -> str:
    """DuckDB mirror: same tokenizer as decontam's proven-parity oracle,
    same 0-based window positions, islands merged with the same
    overlapping-or-adjacent rule (pos <= running max end + 1). The
    oracle groups windows by their RAW TEXT — the Spark side's xxhash64
    fingerprint is an internal key that never reaches the output spans,
    so the oracle needs no hash at all (the decontam.py portable-oracle
    pattern)."""
    return f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS ts
            FROM documents
        ),
        w AS (
            SELECT doc_id, i - 1 AS pos,
                   array_to_string(ts[i : i + {window} - 1], ' ') AS h
            FROM tok,
                 unnest(generate_series(1, len(ts) - {window} + 1)) AS u(i)
            WHERE len(ts) >= {window}
        ),
        dup AS (
            SELECT h FROM w GROUP BY h
            HAVING count(DISTINCT doc_id) >= {min_docs}
        ),
        hits AS (
            SELECT doc_id, pos, pos + {window} - 1 AS e
            FROM w JOIN dup USING (h)
        ),
        isl AS (
            SELECT doc_id, pos, e,
                   CASE WHEN pos <= coalesce(max(e) OVER (
                            PARTITION BY doc_id ORDER BY pos, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -2) + 1
                        THEN 0 ELSE 1 END AS brk
            FROM hits
        ),
        grp AS (
            SELECT doc_id, pos, e,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos, e) AS g
            FROM isl
        )
        SELECT doc_id,
               CAST(min(pos) AS INTEGER) AS start_tok,
               CAST(max(e) AS INTEGER) AS end_tok
        FROM grp GROUP BY doc_id, g
    """


# Driver slot since r10 (r9 verdict item 3: driver-slot evidence for
# the ExactSubstr family) — slot freed by the r10 minhash/simhash
# rotation (see minhash.py registry comment).
QUERIES = {"q_dedup_substrings": q_dedup_substrings}
ORACLE = {
    "q_dedup_substrings": substring_oracle_sql(SUBSTR_WINDOW, 2),
}

TEST_QUERIES: dict = {}
TEST_ORACLE: dict = {}
