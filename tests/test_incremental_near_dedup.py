"""IncrementalNearDeduper: batch-over-batch MinHash admission must equal
the serial greedy model over the SAME edge predicate (banded LSH probe +
signature-agreement verify), replayed batches must be idempotent, and on
bridge-free corpora the accepted set must coincide with one-shot
pairs + connected-components keepers."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.operators.incremental import IncrementalNearDeduper


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog by the old river bank at dawn"
ALT = "completely different words about spark partitions shuffles and columnar scans here"
THIRD = "a third unrelated subject entirely devoted to parquet footers and row groups"

B1 = [
    (1, BASE),
    (2, ALT),
    (3, BASE.replace("dawn", "dusk")),  # in-batch near-dup of 1
    (4, "too short"),  # < 3 tokens of shingle: trivial accept
]
B2 = [
    (10, BASE.replace("quick", "swift")),  # cross-batch near-dup of 1
    (11, THIRD),
    (12, THIRD.replace("third", "fourth")),  # in-batch near-dup of 11
]
B3 = [
    (20, ALT.replace("here", "today")),  # cross-batch near-dup of 2
    (21, "entirely novel content with no token overlap whatsoever anywhere"),
]


def _serial_greedy(edge_set, batches, trivial_ids):
    """The documented contract: per batch, components over (in-batch
    edges + edges to already-accepted docs); contaminated components
    rejected wholesale, clean ones keep their min id; edge-free and
    trivial docs accepted."""
    accepted: set[int] = set()
    out: dict[int, set[int]] = {}
    for bi, ids in enumerate(batches):
        ids = [i for i in ids if i not in accepted]
        adj = {i: set() for i in ids}
        contaminated_roots = set()
        for i in ids:
            for j in ids:
                if i < j and ((i, j) in edge_set or (j, i) in edge_set):
                    adj[i].add(j)
                    adj[j].add(i)
        # components over in-batch edges
        seen_nodes, comps = set(), []
        for i in ids:
            if i in seen_nodes or i in trivial_ids:
                continue
            stack, comp = [i], set()
            while stack:
                n = stack.pop()
                if n in comp:
                    continue
                comp.add(n)
                stack.extend(adj[n] - comp)
            seen_nodes |= comp
            comps.append(comp)
        batch_accept = {i for i in ids if i in trivial_ids}
        for comp in comps:
            dirty = any(
                (n, s) in edge_set or (s, n) in edge_set
                for n in comp
                for s in accepted
            )
            if not dirty:
                batch_accept.add(min(comp))
        out[bi] = batch_accept
        accepted |= {i for i in batch_accept if i not in trivial_ids}
    return out


def _edge_set(spark, all_rows, deduper):
    """One-shot edge set over the concatenated corpus using the SAME
    predicate the operator applies (banded probe + sig agreement)."""
    sigs = deduper._sig_table(_docs(spark, all_rows))
    edges = deduper._banded_edges(sigs, sigs).filter(F.col("id_a") < F.col("id_b"))
    return {(r.id_a, r.id_b) for r in edges.collect()}


def test_incremental_near_equals_serial_greedy(spark, tmp_path):
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    edge_set = _edge_set(spark, B1 + B2 + B3, d)
    # sanity: the fixture actually produces in-batch AND cross-batch edges
    assert (1, 3) in edge_set and any(a == 1 and b == 10 or a == 10 for a, b in edge_set)

    model = _serial_greedy(
        edge_set,
        [[i for i, _ in B] for B in (B1, B2, B3)],
        trivial_ids={4},
    )
    got = {}
    for bi, B in enumerate((B1, B2, B3)):
        got[bi] = {r.doc_id for r in d.process_batch(_docs(spark, B)).collect()}
    assert got == model
    # concrete expectations so the model itself is pinned too
    assert got[0] == {1, 2, 4}
    assert got[1] == {11}
    assert got[2] == {21}
    # 1, 2, 11, 21 + trivial 4 (persisted with NULL sig so later
    # re-sends of short docs drop too)
    assert d.seen_count() == 5


def test_bridge_free_matches_one_shot_groups(spark, tmp_path):
    """On a corpus with no cross-batch bridges, incremental acceptance ==
    one-shot connected-components keepers over the same edge set."""
    from streamy_db_spark.operators.dedup import connected_components

    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    batches = (B1, B2, B3)
    all_rows = B1 + B2 + B3
    edge_set = _edge_set(spark, all_rows, d)

    accepted = set()
    for B in batches:
        accepted |= {r.doc_id for r in d.process_batch(_docs(spark, B)).collect()}

    edges_df = spark.createDataFrame(
        sorted(edge_set), "id_a long, id_b long"
    )
    comp = {r.node: r.keeper for r in connected_components(edges_df).collect()}
    all_ids = {i for i, _ in all_rows}
    keepers = {i for i in all_ids if comp.get(i, i) == i}
    assert accepted == keepers


def test_replayed_batch_is_idempotent(spark, tmp_path):
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    first = {r.doc_id for r in d.process_batch(_docs(spark, B1)).collect()}
    before = d.seen_count()
    # crash-replay contract: the SAME batch reproduces the SAME output
    # (previously accepted rows re-emitted, nothing re-appended) — what
    # the streaming twin's per-batch overwrite sink needs for
    # exactly-once
    again = {r.doc_id for r in d.process_batch(_docs(spark, B1)).collect()}
    assert again == first == {1, 2, 4}
    assert d.seen_count() == before
    nxt = {r.doc_id for r in d.process_batch(_docs(spark, B2)).collect()}
    assert nxt == {11}


def test_exact_copy_across_batches_rejected(spark, tmp_path):
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    d.process_batch(_docs(spark, [(1, BASE)]))
    out = {r.doc_id for r in d.process_batch(_docs(spark, [(2, BASE)])).collect()}
    assert out == set()


def test_corrupt_state_raises(spark, tmp_path):
    import pytest

    p = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(p))
    d.process_batch(_docs(spark, B1))
    for f in p.glob("*.parquet"):
        f.write_bytes(b"garbage")
    with pytest.raises(Exception):
        d.process_batch(_docs(spark, B2))


def test_compact_state_preserves_near_dedup_verdicts(spark, tmp_path):
    p = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(p))
    d.process_batch(_docs(spark, B1))
    d.process_batch(_docs(spark, B2))
    before_files = len(list(p.glob("*.parquet")))
    seen_before = d.seen_count()

    n = d.compact_state()
    assert len(list(p.glob("*.parquet"))) == n <= before_files
    assert d.seen_count() == seen_before

    # post-compaction verdicts unchanged: near-dup of an accepted doc
    # still rejected, novel content still admitted
    got = {r.doc_id for r in d.process_batch(_docs(spark, B3)).collect()}
    assert got == {21}


def test_batch_id_distinguishes_replay_from_resend(spark, tmp_path):
    """With batch ids, a crash-replay (same batch_id) reproduces its
    output while an upstream re-send of an accepted id in a LATER batch
    is dropped — never duplicated (r6 review)."""
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    first = {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert first == {1, 2, 4}
    # crash-replay of batch 0: identical output
    again = {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert again == first
    # batch 1 re-sends accepted doc 1 alongside novel content: the
    # re-send is DROPPED, the novel doc admits
    resend = B2 + [(1, BASE)]
    out = {
        r.doc_id
        for r in d.process_batch(_docs(spark, resend), batch_id=1).collect()
    }
    assert 1 not in out
    assert out == {11}


def test_short_doc_resend_dropped_with_batch_ids(spark, tmp_path):
    """Trivial (no-shingle) docs are persisted too: a later-batch
    re-send of a short doc is dropped, not duplicated (r6 review)."""
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    first = {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert 4 in first  # the short doc admitted once
    out = {
        r.doc_id
        for r in d.process_batch(
            _docs(spark, [(4, "too short"), (30, THIRD)]), batch_id=3
        ).collect()
    }
    assert out == {30}


def test_near_output_survives_state_compaction(spark, tmp_path):
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    d.process_batch(_docs(spark, B1), batch_id=0)
    out = d.process_batch(_docs(spark, B1), batch_id=0)  # replay path
    d.compact_state()
    assert {r.doc_id for r in out.collect()} == {1, 2, 4}
