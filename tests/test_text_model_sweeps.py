"""Model-based sweeps: chunking and decontamination compared against
pure-Python reference models over exhaustive size ranges (every token
count 0..41 crosses each chunk/stride boundary case) and seeded random
text. One Spark job per sweep — the whole input range rides in one
DataFrame."""

from __future__ import annotations

import math
import random

from streamy_db_spark.operators.decontam import contaminated_ids
from streamy_db_spark.operators.text_quality import chunk_documents

CHUNK, OVERLAP = 7, 3
STEP = CHUNK - OVERLAP


def _model_chunks(toks: list[str]) -> list[list[str]]:
    if not toks:
        return []
    n_chunks = 1 + math.ceil(max(len(toks) - CHUNK, 0) / STEP)
    return [toks[i * STEP : i * STEP + CHUNK] for i in range(n_chunks)]


def test_chunking_matches_model_for_all_small_sizes(spark):
    docs = [
        (n, " ".join(f"w{i}" for i in range(n))) for n in range(0, 42)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=CHUNK, overlap=OVERLAP)
    got: dict[int, dict[int, str]] = {}
    for r in out.collect():
        got.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text
    for n, _text in docs:
        toks = [f"w{i}" for i in range(n)]
        expect = _model_chunks(toks)
        chunks = got.get(n, {})
        assert len(chunks) == len(expect), f"n={n}"
        for i, ctoks in enumerate(expect):
            assert chunks[i] == " ".join(ctoks), f"n={n} chunk={i}"
        # reconstruction: chunk i (i>0) repeats exactly the last OVERLAP
        # tokens of the preceding stride, so stitching chunks with the
        # overlap dropped restores the token stream
        stitched: list[str] = []
        for i in range(len(expect)):
            piece = chunks[i].split(" ") if chunks[i] else []
            stitched.extend(piece if i == 0 else piece[OVERLAP:])
        assert stitched == toks, f"n={n}"


def _model_ngrams(toks: list[str], n: int) -> set[str]:
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def test_decontamination_matches_model_on_random_text(spark):
    """Seeded random docs over a 6-word vocab (collisions guaranteed)
    vs a Python model of tokenize→n-gram→overlap membership."""
    rng = random.Random(1234)
    vocab = ["red", "blue", "green", "cyan", "lime", "teal"]
    n = 4
    corpus = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(60)
    ]
    bench = [
        (" ".join(rng.choice(vocab) for _ in range(rng.randint(2, 8))),)
        for _ in range(8)
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "text string")
    got = {r.doc_id for r in contaminated_ids(cdf, bdf, n=n).collect()}

    bench_grams: set[str] = set()
    for (t,) in bench:
        bench_grams |= _model_ngrams(t.split(), n)
    expect = {
        i for i, t in corpus if _model_ngrams(t.split(), n) & bench_grams
    }
    assert got == expect
