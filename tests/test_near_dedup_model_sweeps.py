"""Randomized model sweeps for the r6 near-dedup additions:

1. lsh_candidate_pairs with a hot-bucket cap vs a pure-Python
   reconstruction of the star/all-pairs rule from the actual band
   table — the cap's candidate-set contract on arbitrary corpora, not
   just the planted fixture.
2. IncrementalNearDeduper vs the serial greedy admission model over
   randomized multi-batch corpora — same discipline as the protocol
   engine's serial-oracle sweeps (tests/test_protocol_properties.py).

Corpora are seeded random.Random draws from a small token vocabulary so
band collisions and near-dup edges actually occur at tiny sizes.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from streamy_db_spark.operators.incremental import IncrementalNearDeduper
from streamy_db_spark.operators.minhash import lsh_candidate_pairs, minhash_bands


def _random_docs(seed: int, n: int = 40, vocab: int = 12, length: int = 9):
    """Docs over a tiny vocabulary: plenty of shared shingles, frequent
    band collisions, occasional exact copies."""
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for i in range(n):
        if rows and rng.random() < 0.2:
            # perturbed copy of an earlier doc: swap one word
            base = rng.choice(rows)[1].split()
            j = rng.randrange(len(base))
            base[j] = rng.choice(words)
            rows.append((i, " ".join(base)))
        else:
            rows.append((i, " ".join(rng.choice(words) for _ in range(length))))
    return rows


def _model_capped_pairs(bands_rows, cap):
    """Pure-Python mirror of lsh_candidate_pairs(max_bucket_size=cap)
    from the band table: small buckets all-pairs, hot buckets star to
    the min doc_id."""
    buckets: dict[tuple, list[int]] = {}
    for r in bands_rows:
        buckets.setdefault((r["band"], r["band_hash"]), []).append(r["doc_id"])
    pairs = set()
    for members in buckets.values():
        members = sorted(set(members))
        if len(members) <= cap:
            pairs.update(
                (a, b) for i, a in enumerate(members) for b in members[i + 1 :]
            )
        else:
            rep = members[0]
            pairs.update((rep, m) for m in members[1:])
    return pairs


def test_capped_candidates_match_python_model_random_corpora(spark):
    for seed in (7, 19, 20260814):
        docs = spark.createDataFrame(
            _random_docs(seed), "doc_id long, text string"
        )
        bands = minhash_bands(docs).localCheckpoint(eager=True)
        bands_rows = bands.collect()
        for cap in (2, 5):
            got = {
                (r["id_a"], r["id_b"])
                for r in lsh_candidate_pairs(bands, max_bucket_size=cap).collect()
            }
            want = _model_capped_pairs(bands_rows, cap)
            assert got == want, (seed, cap)
        # cap=None must be the pure all-pairs set (= huge-cap model)
        got_exact = {
            (r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(bands).collect()
        }
        assert got_exact == _model_capped_pairs(bands_rows, 10**9), seed


def _serial_greedy(edge_set, batches):
    accepted: set[int] = set()
    out: set[int] = set()
    for ids in batches:
        ids = [i for i in ids if i not in accepted]
        adj = {i: set() for i in ids}
        for i in ids:
            for j in ids:
                if i < j and ((i, j) in edge_set or (j, i) in edge_set):
                    adj[i].add(j)
                    adj[j].add(i)
        seen_nodes = set()
        batch_accept = set()
        for i in ids:
            if i in seen_nodes:
                continue
            stack, comp = [i], set()
            while stack:
                n = stack.pop()
                if n in comp:
                    continue
                comp.add(n)
                stack.extend(adj[n] - comp)
            seen_nodes |= comp
            dirty = any(
                (n, s) in edge_set or (s, n) in edge_set
                for n in comp
                for s in accepted
            )
            if not dirty:
                batch_accept.add(min(comp))
        out |= batch_accept
        accepted |= batch_accept
    return out


def test_incremental_near_dedup_matches_model_random_corpora(spark, tmp_path):
    for seed in (3, 11):
        rows = _random_docs(seed, n=30, vocab=10, length=8)
        batches = [rows[:10], rows[10:20], rows[20:]]
        d = IncrementalNearDeduper(
            spark, str(tmp_path / f"state{seed}")
        )
        # the SAME edge predicate the operator applies, over the full corpus
        sigs = d._sig_table(spark.createDataFrame(rows, "doc_id long, text string"))
        edges = d._banded_edges(sigs, sigs).filter(F.col("id_a") < F.col("id_b"))
        edge_set = {(r.id_a, r.id_b) for r in edges.collect()}
        assert edge_set, f"seed {seed}: vacuous corpus, no edges drawn"

        got = set()
        for part in batches:
            got |= {
                r.doc_id
                for r in d.process_batch(
                    spark.createDataFrame(part, "doc_id long, text string")
                ).collect()
            }
        want = _serial_greedy(edge_set, [[i for i, _ in p] for p in batches])
        assert got == want, seed
