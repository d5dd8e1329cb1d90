"""MinHash-LSH, SimHash, and n-gram Jaccard near-dedup over ``documents``.

Training-data dedup at 100 TB is shingle → sketch → band → bucket-join:
the only shuffle moves fixed-width sketches (not text), and candidate
verification touches same-bucket pairs only — O(N·k + candidates), never
O(N²). The brute-force Jaccard pair query here is the correctness
baseline at sf0.01; the LSH path is the scale path.

Oracle discipline: every hash is md5-of-UTF8 (hex, lowercase) and every
shingle/tokenize step uses constructs DuckDB evaluates bit-identically
(regexp_split, list_transform, list_min), so all queries sit under the
driver's strong value-hash gate — no rows-only escapes.

MinHash family trick: ONE md5 per shingle, split into two 32-bit words
(w1, w2); hash_i = (A_i*w1 + B_i*w2 + C_i) mod 2^32 with fixed per-slot
constants (``_SLOT_ABC``) — the power-of-two wrap gives each slot an
independent shingle ranking (the r8 fix; the earlier wrap-free
h1 + i*h2 left slots correlated and agreement was not a Jaccard
estimate — see minhash_signature's docstring for the measurements).
The hex→int conversion is portable (Spark ``conv(x,16,10)`` ≡ DuckDB
``('0x'||x)::BIGINT`` — verified equal), and one md5 replaces the k
per-seed digests of the naive scheme.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.operators.text import WS_RE
from streamy_db_spark.sources.tables import load_table

SHINGLE_W = 3        # word-trigram shingles
MINHASH_K = 16       # signature length
LSH_BANDS = 4        # 4 bands × 4 rows
LSH_ROWS = MINHASH_K // LSH_BANDS
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 16    # 4 md5 hex digits per token → 16-bit fingerprint


def _md5(col: Column) -> Column:
    return F.md5(F.encode(col, "UTF-8"))


def shingles_of_tokens(tokens: Column, w: int = SHINGLE_W) -> Column:
    """Distinct word w-gram shingles of a pre-materialized token array.

    IMPORTANT perf note: ``tokens`` must be a real column reference, not
    an inline expression — Catalyst does not CSE subexpressions inside
    higher-order-function lambdas, so an inline ``split()`` re-runs once
    per ``element_at`` per gram (~150× per doc; measured ~20× slower at
    sf0.1). See with_shingles."""
    n = F.size(tokens)
    grams = F.transform(
        F.sequence(F.lit(0), n - w),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j + 1) for j in range(w)]
        ),
    )
    return F.when(n >= w, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: Column, w: int = SHINGLE_W) -> Column:
    """Shingles from raw text — fine for literals/small inputs; use
    with_shingles (token materialization) on tables."""
    return shingles_of_tokens(
        F.filter(F.split(F.lower(text), WS_RE), lambda x: x != ""), w
    )


# Sentinel "infinity" for the signature fold (any real hash value is
# < 2^32, see overflow note in minhash_signature).
_SIG_INF = 1 << 62

# Per-slot multiplicative-hash constants (A_i, B_i, C_i): A/B are odd
# 29-bit, C is 32-bit, all derived deterministically as
# md5(f"minhash-slot-{i}") hex slices (A = hex[0:8] % 2^29 | 1,
# B = hex[8:16] % 2^29 | 1, C = hex[16:24]) and hardcoded so the DuckDB
# oracle mirrors them as literals. See minhash_signature for why the
# slots need independent scrambling.
_SLOT_ABC = [
    (276618745, 166959213, 316977833),
    (204844219, 509653903, 4088432660),
    (487687911, 475037471, 1760034913),
    (167723189, 236805311, 809765378),
    (523305307, 286434797, 1352386162),
    (150453591, 321547717, 2247332929),
    (288985381, 362303557, 2695801051),
    (322133405, 207788373, 3069677178),
    (310171789, 444372759, 3697268152),
    (77871863, 237913449, 344688484),
    (410936263, 274954403, 745868309),
    (472032325, 460614301, 1642782650),
    (270449409, 135748971, 1587118088),
    (170323381, 516470431, 3616546159),
    (73950239, 475260253, 2740184297),
    (529847729, 255302831, 3102590468),
]
_SLOT_MOD = 1 << 32


#: low-32-bit mask for unpacking the packed shingle hash (below)
_W32_MASK = (1 << 32) - 1


def shingle_hashes(sh: Column) -> Column:
    """One 64-bit hash per shingle: the two leading 32-bit md5 words
    (w1, w2 — exactly the pair minhash_signature folds over) packed as
    ``(w1 << 32) | w2`` with bitwise ops (no arithmetic — shiftleft/OR
    cannot overflow-error under ANSI, and the packing is injective on
    (w1, w2), so unpacking recovers both words EXACTLY).

    This is the lightweight proxy for a shingle everywhere downstream
    of tokenization (guide §2.3 / §8: shuffle and persist keys, not
    payloads): the signature fold consumes only (w1, w2), and set
    operations over the hashes (Jaccard intersect/union sizes) equal
    the same operations over the shingle strings absent a 64-bit md5-
    prefix collision inside one comparison — astronomically unlikely
    and pinned per-corpus by the oracle gate plus
    tests/test_oracle_queries.py's collision probe. 8 bytes per shingle
    instead of a ~20-30 byte gram string in every persisted sketch.

    The inner transform materializes ONE md5 per shingle; the outer
    lambda binds it, so the two substring reads share one digest (no
    CSE inside higher-order lambdas — the family's standing rule)."""
    return F.transform(
        F.transform(sh, _md5),
        lambda d: F.shiftleft(
            F.conv(F.substring(d, 1, 8), 16, 10).cast("long"), 32
        ).bitwiseOR(F.conv(F.substring(d, 9, 8), 16, 10).cast("long")),
    )


def minhash_signature_from_hashes(hs: Column, k: int = MINHASH_K) -> Column:
    """k-element MinHash signature from packed shingle hashes (see
    shingle_hashes) — bit-identical to ``minhash_signature`` over the
    same shingles: the fold consumes (w1, w2) unpacked exactly from the
    packed 64-bit value (shiftrightunsigned / mask are lossless for
    w1, w2 < 2^32)."""
    words = F.transform(
        hs,
        lambda h: F.struct(
            F.shiftrightunsigned(h, 32).alias("w1"),
            h.bitwiseAND(F.lit(_W32_MASK)).alias("w2"),
        ),
    )
    return _signature_fold(words, k)


def minhash_signature(sh: Column, k: int = MINHASH_K) -> Column:
    """k-element signature: hash_i(s) = (A_i*w1(s) + B_i*w2(s) + C_i)
    mod 2^32, where w1/w2 are the two leading 32-bit words of ONE md5
    per shingle and (A_i, B_i, C_i) are the fixed per-slot constants in
    ``_SLOT_ABC``. sig[i] = min over shingles of hash_i.

    Why the mod-2^32 wrap is LOAD-BEARING (r8 fix): the previous scheme
    hash_i = h1 + i*h2 (no modulo) left every slot's ORDERING dominated
    by whichever shingle had small (h1, h2) — the slots were heavily
    correlated, so signature agreement was NOT a Jaccard estimate:
    measured on the sf0.01 documents corpus, 78% of band candidates
    with agreement ≥ 0.5 had TRUE Jaccard < 0.5 (some at J=0.01 with
    agreement 0.94), which made the signature-only incremental
    near-dedup gate reject ~58% of a corpus whose real near-dup rate
    was ~5%. With per-slot multiplicative scrambling (odd multiplier,
    power-of-two wrap — the standard 2-universal-style family) each
    slot ranks shingles independently, agreement/16 is the unbiased
    MinHash estimate of J, and the same corpus measures
    candidates(est ≥ 0.5) ≈ pairs(J ≥ 0.5).

    One md5 per shingle instead of k — the earlier per-seed scheme
    (md5('<i>|'||s) × 16) made hashing 16× the work and dominated the
    sketch stage (measured ~7 s of q_dedup_groups' 8.6 s at sf0.1).
    The whole signature is ONE aggregate fold: the per-shingle (w1, w2)
    array is the fold input, so it evaluates once — Catalyst does no CSE
    across k separate array_min aggregate expressions (same pitfall as
    the r3 simhash fix). Overflow-safe under ANSI: A,B < 2^29 and
    w1,w2 < 2^32 → A*w1 + B*w2 + C < 2^62, inside int64; the % keeps
    every slot value < 2^32.

    Empty shingle set → all-sentinel signature (callers filter
    size(shingles) > 0 upstream)."""
    # Two-level transform: the inner map materializes ONE md5 string
    # per shingle; the outer map slices it into the two words. A single
    # struct(conv(md5..), conv(md5..)) lambda would md5 every shingle
    # TWICE — no CSE inside higher-order lambdas (measured ~25% of the
    # whole pair pipeline at sf0.1).
    hs = F.transform(
        F.transform(sh, _md5),
        lambda d: F.struct(
            F.conv(F.substring(d, 1, 8), 16, 10).cast("long").alias("w1"),
            F.conv(F.substring(d, 9, 8), 16, 10).cast("long").alias("w2"),
        ),
    )
    return _signature_fold(hs, k)


def _signature_fold(hs: Column, k: int) -> Column:
    """THE signature fold: min over (w1, w2) word structs of the k
    per-slot multiplicative hashes. One implementation shared by the
    string path (minhash_signature) and the packed-hash path
    (minhash_signature_from_hashes) so they can never drift."""
    if k > len(_SLOT_ABC):
        raise ValueError(f"k={k} exceeds the {len(_SLOT_ABC)} slot constants")
    a_arr = F.array(*[F.lit(a) for a, _, _ in _SLOT_ABC[:k]])
    b_arr = F.array(*[F.lit(b) for _, b, _ in _SLOT_ABC[:k]])
    c_arr = F.array(*[F.lit(c) for _, _, c in _SLOT_ABC[:k]])
    return F.aggregate(
        hs,
        F.array_repeat(F.lit(_SIG_INF), k),
        lambda acc, h: F.transform(
            acc,
            lambda m, j: F.least(
                m,
                (
                    F.element_at(a_arr, j + 1) * h["w1"]
                    + F.element_at(b_arr, j + 1) * h["w2"]
                    + F.element_at(c_arr, j + 1)
                )
                % F.lit(_SLOT_MOD),
            ),
        ),
    )


def with_shingles(docs: DataFrame) -> DataFrame:
    return (
        docs.withColumn(
            "_tokens", F.filter(F.split(F.lower("text"), WS_RE), lambda x: x != "")
        )
        .withColumn("shingles", shingles_of_tokens(F.col("_tokens")))
        .drop("_tokens")
    )


def minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, band_hash) — one row per LSH band. Docs with fewer
    than SHINGLE_W tokens have no shingles and are excluded (they cannot
    be near-dups of anything under shingle Jaccard)."""
    return minhash_bands_from_shingles(
        with_shingles(docs).filter(F.size("shingles") > 0).select("doc_id", "shingles")
    )


def band_hashes(sig: Column) -> Column:
    """LSH band hashes of a signature as an array<string> whose position
    IS the band index — the compact per-doc form the incremental
    near-dedup state persists (operators/incremental.py)."""
    return F.array(
        *[
            _md5(
                F.concat_ws(
                    "|",
                    *[sig[b * LSH_ROWS + r].cast("string") for r in range(LSH_ROWS)],
                )
            )
            for b in range(LSH_BANDS)
        ]
    )


def minhash_bands_from_shingles(sh: DataFrame) -> DataFrame:
    sig = sh.select("doc_id", minhash_signature(F.col("shingles")).alias("sig"))
    return sig.select(
        "doc_id", F.posexplode(band_hashes(F.col("sig"))).alias("band", "band_hash")
    )


def jaccard(a: Column, b: Column) -> Column:
    # One set operation, not two: the shingle arrays are distinct by
    # construction, so |A ∪ B| = |A| + |B| - |A ∩ B| exactly — skipping
    # the array_union materialization halves the per-candidate verify
    # cost. Same integer sizes → bit-identical double vs the two-op form.
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return inter / union


# Production hot-bucket cap: a bucket of b docs emits b(b-1)/2 pairs,
# so ONE 1M-copy boilerplate cluster (cookie banners, license headers)
# would emit 5e11 pairs from a single bucket — the classic LSH scale
# killer. Above the cap a bucket degrades to a star (every member →
# min doc_id): O(b) edges, connectivity — and therefore dedup-group
# recall after connected_components — is preserved, only the redundant
# intra-cluster pair enumeration is dropped.
HOT_BUCKET_CAP = 64


def lsh_candidate_pairs(
    bands: DataFrame, max_bucket_size: int | None = None
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing ≥1 LSH band bucket.

    Scale shape: self-join co-partitioned on (band, band_hash) — the
    shuffle key is a 32-hex digest, uniformly distributed.

    ``max_bucket_size``: buckets with at most this many docs do the
    exact all-pairs join; hotter buckets (boilerplate text) emit a
    deterministic star instead — each member paired with the bucket's
    min doc_id — bounding a b-doc bucket at b-1 edges instead of
    b(b-1)/2. Downstream Jaccard verification still filters every
    edge; when the star edges verify (members genuinely similar to the
    bucket rep — the boilerplate case), connected_components recovers
    the full cluster. A pair whose every shared bucket is hot and
    whose members both fail verification against their reps is lost
    entirely — the cap trades that recall corner on heterogeneous hot
    buckets for the bounded join. ``None`` (the default,
    used by the oracle-matched registered queries) keeps exact
    semantics; pass ``HOT_BUCKET_CAP`` for production corpora. The
    size/rep aggregation shuffles on the same (band, band_hash) key as
    the join — co-partitioned, no extra exchange pattern."""
    if max_bucket_size is None:
        b1 = bands.select(F.col("doc_id").alias("id_a"), "band", "band_hash")
        b2 = bands.select(F.col("doc_id").alias("id_b"), "band", "band_hash")
        return (
            b1.join(b2, ["band", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    sizes = bands.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("_bsz"), F.min("doc_id").alias("_brep")
    )
    tagged = bands.join(sizes, ["band", "band_hash"])
    small = tagged.filter(F.col("_bsz") <= max_bucket_size)
    s1 = small.select(F.col("doc_id").alias("id_a"), "band", "band_hash")
    s2 = small.select(F.col("doc_id").alias("id_b"), "band", "band_hash")
    pairs_small = (
        s1.join(s2, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    # Star edges: rep = min doc_id, so id_a < id_b holds by construction.
    pairs_hot = (
        tagged.filter(
            (F.col("_bsz") > max_bucket_size) & (F.col("doc_id") != F.col("_brep"))
        )
        .select(F.col("_brep").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    return pairs_small.unionByName(pairs_hot).distinct()


def minhash_near_dup_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard ≥ threshold.
    ``max_bucket_size`` caps hot LSH buckets (see lsh_candidate_pairs).

    The shingle set is materialized ONCE and feeds both the sketch/band
    side and the two verify joins — the bench-scale analogue of
    persisting the sketch table, which is how this runs at 100 TB
    (shingling + 16 md5-min passes dominate; never recompute them per
    join branch). Corpus-scale cache discipline (substring.py's rule,
    applied here by the r10 advice): the shingle frame's payload is
    O(total tokens), so it is persisted DISK_ONLY — recomputable on
    executor loss, freed by the explicit unpersist instead of pinning
    executor-local blocks until driver GC — the small verified-pair
    result is eagerly checkpointed, and both intermediates are RELEASED
    before returning. The repartition spreads the CPU-heavy shingle
    stage across cores when the input is a handful of small files (one
    scan partition otherwise); on a real corpus the scan already has
    thousands of splits and the exchange is just a hash co-location."""
    from pyspark.storagelevel import StorageLevel

    from streamy_db_spark.sources.tables import spread

    # Persist the packed shingle HASHES, not the gram strings (r14,
    # guide §2.3/§5 — same projection as sketch_table_cached): the
    # signature and the Jaccard verify both consume only the hashes,
    # so the O(total tokens × gram width) text payload never enters
    # the persisted frame.
    sh = (
        with_shingles(spread(docs.select("doc_id", "text"), "doc_id"))
        .filter(F.size("shingles") > 0)
        .select("doc_id", shingle_hashes(F.col("shingles")).alias("hs"))
        .persist(StorageLevel.DISK_ONLY)
    )
    try:
        sig = sh.select(
            "doc_id", minhash_signature_from_hashes(F.col("hs")).alias("sig")
        )
        bands = sig.select(
            "doc_id",
            F.posexplode(band_hashes(F.col("sig"))).alias("band", "band_hash"),
        ).persist(StorageLevel.DISK_ONLY)
        try:
            cand = lsh_candidate_pairs(bands, max_bucket_size=max_bucket_size)
            a = sh.select(
                F.col("doc_id").alias("id_a"), F.col("hs").alias("sh_a")
            )
            b = sh.select(
                F.col("doc_id").alias("id_b"), F.col("hs").alias("sh_b")
            )
            return (
                cand.join(a, "id_a")
                .join(b, "id_b")
                .select(
                    "id_a",
                    "id_b",
                    jaccard(F.col("sh_a"), F.col("sh_b")).alias("j"),
                )
                .filter(F.col("j") >= threshold)
                .select("id_a", "id_b", F.round("j", 4).alias("jaccard"))
                .localCheckpoint(eager=True)
            )
        finally:
            bands.unpersist()
    finally:
        sh.unpersist()


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Bitwise-majority fingerprint over token md5s (first bits/4 hex
    digits). bit_j = 1 iff Σ_tokens bit_j(md5(token)) * 2 > n_tokens.

    Single scan, no shuffle, and a SINGLE fold: each token's hex prefix
    converts to one integer and contributes all ``bits`` counters in one
    pass (two-arg transform lambda = (element, index)). The earlier
    16-separate-folds formulation re-evaluated the md5/substring array
    per bit — Catalyst does no CSE across aggregate expressions — i.e.
    16× the hashing work (r1/r2 verdicts). Hamming-distance bucketing on
    the fingerprint is the scale path for near-dup text at 100 TB.

    Bit order matches the hex-digit reading: bit j lives in hex digit
    j//4 (MSB-first within the digit), so for the integer value v of the
    prefix, bit_j(v) = (v >> shift_j) & 1 with
    shift_j = 4*(ndigits-1-j//4) + (3-j%4) — implemented as exact
    float pow/floor arithmetic (16-bit range, no precision risk)."""
    ndigits = bits // 4
    tokens = F.filter(F.split(F.lower(text), WS_RE), lambda x: x != "")
    n = F.size(tokens)
    vals = F.transform(
        tokens,
        lambda t: F.conv(F.substring(_md5(t), 1, ndigits), 16, 10).cast("long"),
    )

    def _shift(j: Column) -> Column:
        # power-of-two divisor for bit j's position in the prefix integer
        digit = F.floor(j / 4)  # 0-based hex digit index, MSB side
        bit_in_digit = F.lit(3) - j % 4
        return F.pow(
            F.lit(2.0),
            ((F.lit(ndigits - 1) - digit) * 4 + bit_in_digit).cast("double"),
        )

    ones = F.aggregate(
        vals,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, v: F.transform(
            acc,
            lambda c, j: c + (F.floor(v / _shift(j)).cast("long") % 2),
        ),
    )
    return F.aggregate(
        F.transform(
            ones,
            lambda o, j: F.when(
                o * 2 > n, F.pow(F.lit(2.0), j.cast("double"))
            ).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    ).cast("int")


# Two memoization layers per (application, sf_dir), both the bench-scale
# analogue of how a 100 TB dedup pipeline actually runs — sketch → pairs
# → clusters as successive MATERIALIZED stages, never recomputed:
# - _SKETCH_CACHE: (doc_id, shingles, sig) — the shingle + 16-pass
#   signature pipeline is the expensive stage; every consumer (exact
#   pair query, capped pair query, group resolution) reads the same
#   materialized sketch table.
# - _PAIRS_CACHE: the verified pair set — shared by the pair query and
#   dedup_groups.
_SKETCH_CACHE: dict[tuple, DataFrame] = {}
_PAIRS_CACHE: dict[tuple, DataFrame] = {}
_CACHE_CAP = 8  # bounded: dict insertion order = FIFO eviction


def _corpus_key(spark: SparkSession, sf_dir: str) -> tuple:
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # Spark Connect: no SC handle; fall back to session id
        app = id(spark)
    return (app, sf_dir)


def _memo(cache: dict, key: tuple, df: DataFrame) -> DataFrame:
    while len(cache) >= _CACHE_CAP:
        cache.pop(next(iter(cache)))
    cache[key] = df
    return df


def clear_corpus_caches(spark: SparkSession, sf_dir: str) -> None:
    """Drop every memoized sketch/pair stage for a corpus (all cap
    variants). The bench's budget-retry calls this before re-running a
    query so the retry re-pays the SAME pipeline work the budget was
    pinned against — a cached retry would clear any breach and make the
    gate structurally void for the dedup family (r6 review)."""
    key = _corpus_key(spark, sf_dir)
    for cache in (_SKETCH_CACHE, _PAIRS_CACHE):
        for k in [k for k in cache if k[:2] == key]:
            cache.pop(k, None)


def sketch_table_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized (doc_id, hs, sig) sketch table for a corpus,
    computed once per (session, corpus). ``hs`` is the packed 64-bit
    shingle-hash array (shingle_hashes) — r14: the checkpoint used to
    materialize the raw shingle STRINGS, i.e. the O(total tokens ×
    gram width) text payload, even though the signature fold consumes
    only the md5 words and the verify stage only needs set sizes
    (guide §2.3/§5: persist keys, not payloads — measured 8.19 MB →
    3.36 MB checkpoint at sf0.1, and the saving scales with corpus
    text). EXEMPT from the corpus-scale DISK_ONLY+unpersist discipline
    by design: this frame is the shared cross-invocation stage (the
    100 TB analogue is a persisted sketch TABLE), so there is no
    release point inside any single call — it lives until _memo
    eviction drops the reference and driver GC frees the checkpoint
    blocks. localCheckpoint (MEMORY_AND_DISK) is the right level for a
    frame that every dedup consumer re-reads."""
    key = _corpus_key(spark, sf_dir)
    df = _SKETCH_CACHE.get(key)
    if df is None:
        from streamy_db_spark.sources.tables import spread

        docs = load_table(spark, sf_dir, "documents")
        sh = (
            with_shingles(spread(docs.select("doc_id", "text"), "doc_id"))
            .filter(F.size("shingles") > 0)
            .select("doc_id", shingle_hashes(F.col("shingles")).alias("hs"))
        )
        df = _memo(
            _SKETCH_CACHE,
            key,
            sh.withColumn(
                "sig", minhash_signature_from_hashes(F.col("hs"))
            ).localCheckpoint(eager=True),
        )
    return df


def pairs_from_sketch(
    sk: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Verified near-dup pairs from a materialized sketch table — the
    post-sketch half of minhash_near_dup_pairs, for callers that persist
    the sketch stage (identical semantics: band construction is
    band_hashes(sig), the same expression minhash_bands_from_shingles
    uses; Jaccard is computed over the packed shingle-hash sets — equal
    to string-shingle Jaccard absent a 64-bit collision, see
    shingle_hashes). Returns the verified pairs eagerly checkpointed,
    with the transient band frame persisted DISK_ONLY while it is read
    ≥2× (both sides of the candidate self-join, plus the sizes agg
    under a cap) and RELEASED before returning (corpus-scale cache
    discipline, r10 advice)."""
    from pyspark.storagelevel import StorageLevel

    bands = sk.select(
        "doc_id", F.posexplode(band_hashes(F.col("sig"))).alias("band", "band_hash")
    ).persist(StorageLevel.DISK_ONLY)
    try:
        cand = lsh_candidate_pairs(bands, max_bucket_size=max_bucket_size)
        a = sk.select(
            F.col("doc_id").alias("id_a"), F.col("hs").alias("sh_a")
        )
        b = sk.select(
            F.col("doc_id").alias("id_b"), F.col("hs").alias("sh_b")
        )
        return (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .select(
                "id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("j")
            )
            .filter(F.col("j") >= threshold)
            .select("id_a", "id_b", F.round("j", 4).alias("jaccard"))
            .localCheckpoint(eager=True)
        )
    finally:
        bands.unpersist()


def minhash_near_dup_pairs_cached(
    spark: SparkSession, sf_dir: str, max_bucket_size: int | None = None
) -> DataFrame:
    """Memoized verified pair set per (session, corpus, cap variant) —
    each variant materializes once per corpus (pairs_from_sketch
    returns it eagerly checkpointed and releases its transient band
    frame), so repeated driver/bench invocations re-read the checkpoint
    instead of recomputing the pipeline (r6 review)."""
    key = (*_corpus_key(spark, sf_dir), max_bucket_size)
    df = _PAIRS_CACHE.get(key)
    if df is None:
        df = _memo(
            _PAIRS_CACHE,
            key,
            pairs_from_sketch(
                sketch_table_cached(spark, sf_dir),
                max_bucket_size=max_bucket_size,
            ),
        )
    return df


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_near_dup_pairs_cached(spark, sf_dir)


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force shingle-Jaccard pairs — exact recall baseline the LSH
    variant is measured against (O(N²); correctness query, not the scale
    path). Shingle frame DISK_ONLY + released, small result eagerly
    checkpointed (corpus-scale cache discipline, r10 advice)."""
    from pyspark.storagelevel import StorageLevel

    from streamy_db_spark.sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        with_shingles(spread(docs.select("doc_id", "text"), "doc_id"))
        .filter(F.size("shingles") > 0)
        .select("doc_id", "shingles")
        .persist(StorageLevel.DISK_ONLY)
    )
    try:
        a = sh.select(
            F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")
        )
        b = sh.select(
            F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")
        )
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("j")
            )
            .filter(F.col("j") >= JACCARD_THRESHOLD)
            .select("id_a", "id_b", F.round("j", 4).alias("jaccard"))
            .localCheckpoint(eager=True)
        )
    finally:
        sh.unpersist()


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", simhash(F.col("text")).alias("simhash"))


# Driver-registered cap small enough that real sf0.01 buckets exceed it,
# so the CORRECTNESS record exercises the star-degradation path itself
# (r5 verdict item 3) — production corpora use HOT_BUCKET_CAP. Lowered
# 3 → 2 with the r8 signature decorrelation: the correlated slots used
# to manufacture false buckets of size 4+; honest signatures top out at
# size-3 buckets at sf0.01 (4 of them — enough for the star path to
# fire on, guarded by test_capped_query_cap_actually_fires).
_CAPPED_Q_BUCKET_SIZE = 2


def q_minhash_lsh_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION hot-bucket-capped near-dup path under the strong
    value-hash gate: same LSH pipeline as q_minhash_lsh_pairs, but
    buckets above ``_CAPPED_Q_BUCKET_SIZE`` degrade to a deterministic
    star (every member ↔ the bucket's min doc_id) before Jaccard
    verification. The star is a pure function of the bucket contents,
    so the DuckDB oracle mirrors it exactly — no approximation gap.
    Consumes the memoized sketch table: only the band/candidate/verify
    stages differ from q_minhash_lsh_pairs, so only they re-run (and the
    verified pair set is itself memoized per cap variant)."""
    return minhash_near_dup_pairs_cached(
        spark, sf_dir, max_bucket_size=_CAPPED_Q_BUCKET_SIZE
    )


SIMHASH_BAND_BITS = SIMHASH_BITS // 2  # 2 bands × 8 bits
SIMHASH_HAM_MAX = 3


def simhash_neardup_pairs(
    docs: DataFrame, ham_max: int = SIMHASH_HAM_MAX
) -> DataFrame:
    """SimHash near-dup at scale: band the fingerprint (2 × 8-bit here),
    bucket-join on (band, value), verify Hamming ≤ ham_max via
    xor+bit_count. By pigeonhole a pair with ≤1 differing bit always
    shares a band; higher distances may straddle both bands, so the
    operator's contract IS the banded candidate set (the oracle mirrors
    the bands exactly — no approximation gap between engines).

    Scale shape: the shuffle moves (doc_id, 16-bit bucket) pairs only;
    verification is an integer xor per candidate. Production sizing is a
    64-bit simhash with 4 × 16-bit bands (ham_max 3 fully covered by
    pigeonhole); the 16-bit fingerprint here keeps the DuckDB oracle SQL
    tractable (minhash.py simhash docstring)."""
    from streamy_db_spark.sources.tables import spread

    # localCheckpoint, not cache(): the fingerprint frame is read by both
    # sides of the bucket self-join, and checkpoint storage is released
    # with the DataFrame instead of pinning executor cache blocks per
    # invocation. EXEMPT from the corpus-scale DISK_ONLY+unpersist rule
    # (r10 advice): unlike the O(total tokens) shingle/window frames,
    # a fingerprint row is one int per doc — the pinned blocks are
    # O(docs × 4 B), and the frame must outlive this function's LAZY
    # result, so release-with-DataFrame is the correct lifetime.
    sh = (
        spread(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", simhash(F.col("text")).alias("sh"))
        .localCheckpoint(eager=True)
    )
    bands = sh.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.shiftright("sh", SIMHASH_BAND_BITS).alias("val"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.col("sh").bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1)).alias(
                        "val"
                    ),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "sh", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"), "band", "val"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"), "band", "val"
    )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= ham_max)
    )


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_neardup_pairs(docs)


# --- 64-bit SimHash, 4 × 16-bit bands (production sizing) --------------------
#
# The 16-bit fingerprint above keeps its oracle SQL small; this is the
# documented production variant (simhash docstring): 64 bits, 4 bands of
# 16 — by pigeonhole a pair with Hamming distance ≤ 3 always shares at
# least one full band, so the banded candidate set is COMPLETE for
# ham_max ≤ 3 and the near-dup query is exact, not approximate.

SIMHASH64_BITS = 64
SIMHASH64_BANDS = 4
SIMHASH64_BAND_BITS = 16
SIMHASH64_HAM_MAX = 3


def simhash64_band_values(text: Column) -> Column:
    """Array of 4 ints: the 16-bit bands of the 64-bit simhash, band k
    read from hex digits [4k, 4k+4) of each token md5 (MSB-first within
    each digit — same bit order as the 16-bit ``simhash``).

    One md5 per token: the digest feeds a transform over a singleton
    array so all four band windows read ONE evaluation (Catalyst does no
    CSE inside higher-order lambdas — the r1/r2 simhash lesson); the 64
    bit-counters accumulate in a single fold.

    Every repeated subexpression is BOUND through a lambda variable and
    every bit extraction is an integer shift by a LITERAL amount (r10
    rewrite): the original formulation computed bit positions with
    double-precision pow/floor arithmetic AND referenced the whole
    token-fold aggregate (``ones``) from inside per-bit lambdas — no
    CSE inside higher-order lambdas, so the O(tokens) fold re-evaluated
    up to 64× per doc. Measured at sf0.1 (5,000 docs): ~35 s to
    materialize the old form vs ~1.5 s for this one, identical
    fingerprints bit-for-bit (the q_simhash64 oracle and the
    brute-force parity test pin that)."""
    tokens = F.filter(F.split(F.lower(text), WS_RE), lambda x: x != "")

    def _band_ints(t: Column) -> Column:
        # element_at(transform(array(md5(t)), ...), 1): evaluate the
        # digest once, slice four 4-hex windows from it.
        return F.element_at(
            F.transform(
                F.array(_md5(t)),
                lambda m: F.array(
                    *[
                        F.conv(F.substring(m, 4 * k + 1, 4), 16, 10).cast("long")
                        for k in range(SIMHASH64_BANDS)
                    ]
                ),
            ),
            1,
        )

    def _token_bits(v: Column) -> Column:
        # the token's 64 bits, global MSB-first order: band k's value
        # contributes bits [16k, 16k+16), bit j_in read by a literal
        # integer shift (element_at is an O(1) array access; the shift
        # amounts are Python-loop constants, never Column arithmetic)
        return F.array(
            *[
                F.shiftright(
                    F.element_at(v, k + 1), SIMHASH64_BAND_BITS - 1 - j
                ).bitwiseAND(F.lit(1))
                for k in range(SIMHASH64_BANDS)
                for j in range(SIMHASH64_BAND_BITS)
            ]
        )

    ones = F.aggregate(
        F.transform(tokens, _band_ints),
        F.array_repeat(F.lit(0).cast("long"), SIMHASH64_BITS),
        lambda acc, v: F.zip_with(acc, _token_bits(v), lambda a, b: a + b),
    )

    def _bands_of(s: Column) -> Column:
        # Reassemble band k from the bound counters: bit j_in (0 = MSB)
        # contributes the literal 2^(15 - j_in) when its count wins the
        # majority vote (2*count > n_tokens).
        def band(k: int) -> Column:
            out = F.lit(0).cast("long")
            for j in range(SIMHASH64_BAND_BITS):
                out = out + F.when(
                    F.element_at(s["o"], k * SIMHASH64_BAND_BITS + j + 1) * 2
                    > s["n"],
                    F.lit(1 << (SIMHASH64_BAND_BITS - 1 - j)).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            return out.cast("int")

        return F.array(*[band(k) for k in range(SIMHASH64_BANDS)])

    # ones (the whole token fold) and n are read 64× by the reassembly:
    # bind them ONCE through a singleton transform — referencing the
    # aggregate expression directly from the 64 terms re-evaluates it
    # per term (the 35 s plan above).
    bound = F.struct(ones.alias("o"), F.size(tokens).cast("long").alias("n"))
    return F.element_at(F.transform(F.array(bound), _bands_of), 1)


def simhash64_hex(text: Column) -> Column:
    """64-bit simhash as a 16-hex-char lowercase string (bands
    concatenated MSB-first) — string form keeps the full fingerprint
    under the driver's value-hash gate without int64-sign pitfalls."""
    return F.concat_ws(
        "",
        F.transform(
            simhash64_band_values(text),
            lambda b: F.lpad(F.lower(F.hex(b)), 4, "0"),
        ),
    )


def simhash64_neardup_pairs(
    docs: DataFrame,
    ham_max: int = SIMHASH64_HAM_MAX,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """EXACT Hamming-≤ham_max pairs over the 64-bit simhash: bucket-join
    on any of the 4 bands (complete for ham_max ≤ 3 by pigeonhole),
    verify with per-band xor+bit_count. Shuffle moves (doc_id, band,
    16-bit value) only — the production near-dup shape.

    ``max_bucket_size`` caps hot band buckets exactly the way
    lsh_candidate_pairs does for MinHash (the r5 star-degradation,
    shared rationale): a boilerplate-heavy corpus concentrates thousands
    of near-identical fingerprints on one 16-bit band value, and the
    uncapped bucket self-join is O(b²) per such bucket. Buckets at or
    under the cap do the exact all-pairs join; hotter buckets emit a
    deterministic star (every member ↔ the bucket's min doc_id), so a
    b-doc bucket costs b-1 candidate edges instead of b(b-1)/2. Hamming
    verification still filters every edge, and when star edges VERIFY
    (the identical/near-identical boilerplate clusters the cap exists
    for — every member within ham_max of the rep), connected components
    recover the full cluster. The precise loss: a pair whose EVERY
    shared band is hot and whose members both sit farther than ham_max
    from their bucket reps is dropped entirely, not merely
    un-enumerated — size the cap so genuinely-similar clusters keep a
    verifying rep, or accept the recall trade on heterogeneous hot
    buckets. ``None`` keeps the exact pigeonhole-complete semantics."""
    if ham_max >= SIMHASH64_BANDS:
        raise ValueError(
            f"4-band candidates are only complete for ham_max < "
            f"{SIMHASH64_BANDS}; got {ham_max}"
        )
    from streamy_db_spark.sources.tables import spread

    # localCheckpoint, not cache(): read ≥2× (both join sides, plus the
    # sizes agg under a cap) and released with the DataFrame instead of
    # pinning executor cache blocks per invocation. EXEMPT from the
    # corpus-scale DISK_ONLY+unpersist rule (r10 advice): a fingerprint
    # row is 4 ints per doc — O(docs × 32 B) pinned, not O(tokens) —
    # and the frame must outlive this function's LAZY result, so
    # release-with-DataFrame is the correct lifetime.
    fp = (
        spread(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", simhash64_band_values(F.col("text")).alias("bands"))
        .localCheckpoint(eager=True)
    )
    ham = sum(
        F.bit_count(
            F.element_at("bands_a", k + 1).bitwiseXOR(F.element_at("bands_b", k + 1))
        )
        for k in range(SIMHASH64_BANDS)
    )
    exploded = fp.select("doc_id", "bands", F.posexplode("bands").alias("band", "val"))
    if max_bucket_size is None:
        a = exploded.select(
            F.col("doc_id").alias("id_a"),
            F.col("bands").alias("bands_a"),
            "band",
            "val",
        )
        b = exploded.select(
            F.col("doc_id").alias("id_b"),
            F.col("bands").alias("bands_b"),
            "band",
            "val",
        )
        return (
            a.join(b, ["band", "val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "bands_a", "bands_b")
            .distinct()
            .select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= ham_max)
        )
    # Capped path: candidate ids first (small buckets all-pairs, hot
    # buckets star), then verify by joining the tiny fingerprint table
    # back on each side. The star-cap candidate construction is
    # EXACTLY lsh_candidate_pairs' — the bucket key is (band, 16-bit
    # value) instead of (band, md5 digest), which changes nothing in
    # the size/rep/star algebra — so it delegates there instead of
    # cloning the three-frame union (r13: one star-cap implementation
    # for the whole dedup family).
    buckets = exploded.select(
        "doc_id", "band", F.col("val").alias("band_hash")
    )
    cand = lsh_candidate_pairs(buckets, max_bucket_size=max_bucket_size)
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("bands").alias("bands_a"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("bands").alias("bands_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= ham_max)
    )


def q_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", simhash64_hex(F.col("text")).alias("simhash64"))


# Driver-registered cap small enough that the star path changes the
# VERIFIED output on the real sf0.01 data (cap 2: 11 pairs vs 12
# uncapped, candidates 617 vs 1,866; largest natural band bucket is 28
# docs) — the CORRECTNESS record then exercises, and distinguishes, the
# star-degradation path itself. Same non-vacuity rule as
# _CAPPED_Q_BUCKET_SIZE, guarded by
# test_simhash64_capped_cap_actually_fires. Production corpora pick the
# cap by bucket-size distribution (hundreds still exact, boilerplate
# clusters starred).
_SIMHASH64_CAPPED_BUCKET_SIZE = 2


def q_simhash64_neardup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION SimHash near-dup path under the strong value-hash
    gate: 64-bit fingerprint, 4×16-bit bands, hot band buckets degraded
    to a deterministic star before Hamming verification (r9 verdict
    items 1-2 — this was the last uncapped quadratic bucket join in the
    dedup family; see simhash64_neardup_pairs for the precise recall
    trade on heterogeneous hot buckets — measured at this cap on the
    sf0.01 corpus: 11 of 12 near-dup groups survive, no false merges;
    test_simhash64_capped_group_recall_on_natural_data pins it). The
    star is a pure function of the bucket contents, so the DuckDB
    oracle mirrors it exactly — no approximation gap."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash64_neardup_pairs(
        docs, max_bucket_size=_SIMHASH64_CAPPED_BUCKET_SIZE
    )


# q_jaccard_pairs is the deliberately-quadratic recall baseline: it
# stays oracle-checked via TEST_* (tests/test_oracle_queries.py) but no
# longer occupies a driver registry slot a scale-real operator can use
# (r4 verdict item 3). q_simhash (16-bit) rotated to the test registry
# in r6 — subsumed by the production q_simhash64. r10 rotation (r9
# verdict items 1-3): the driver's near-dup slots hold the PRODUCTION
# plans — q_minhash_lsh_pairs_capped and q_simhash64_neardup_capped
# (hot buckets starred, the 100×-viable shapes) — while the exact
# uncapped MinHash pair query (subsumed: same pipeline, cap=None),
# the 16-bit q_simhash_neardup (quadratic-per-bucket past sf0.1 —
# 256 buckets/band), and the fingerprint-only q_simhash64 (subsumed by
# the capped pair query that consumes those fingerprints) keep their
# full DuckDB hash gates in the test registry. The three freed slots
# went to q_simhash64_neardup_capped + the two r9 dedup families
# (q_semantic_dedup, q_dedup_substrings).
QUERIES = {
    "q_minhash_lsh_pairs_capped": q_minhash_lsh_pairs_capped,
    "q_simhash64_neardup_capped": q_simhash64_neardup_capped,
}

TEST_QUERIES = {
    "q_jaccard_pairs": q_jaccard_pairs,
    "q_simhash": q_simhash,
    "q_minhash_lsh_pairs": q_minhash_lsh_pairs,
    "q_simhash_neardup": q_simhash_neardup,
    "q_simhash64": q_simhash64,
}


# --- DuckDB oracle SQL (identical hashing/shingling, 1-indexed lists) -------

_SQL_TOKENS_LIST = (
    r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"
)

_SQL_SHINGLES = f"""
    CASE WHEN len({_SQL_TOKENS_LIST}) >= {SHINGLE_W}
         THEN list_distinct(list_transform(
                range(1, len({_SQL_TOKENS_LIST}) - {SHINGLE_W - 2}),
                i -> {_SQL_TOKENS_LIST}[i] || ' ' || {_SQL_TOKENS_LIST}[i+1]
                     || ' ' || {_SQL_TOKENS_LIST}[i+2]))
         ELSE []::VARCHAR[] END
"""

# Per-slot multiplicative-hash signature (must mirror minhash_signature
# exactly): w1/w2 = the two leading 32-bit words of one md5 per shingle,
# hash_i = (A_i*w1 + B_i*w2 + C_i) % 2^32 with the hardcoded _SLOT_ABC
# constants. Both engines do the arithmetic in non-negative BIGINT, so
# % agrees.
_SQL_SIG_ELEMS = ", ".join(
    "list_min(list_transform(shingles, s ->"
    f" ({a} * ('0x' || substring(md5(s), 1, 8))::BIGINT"
    f" + {b} * ('0x' || substring(md5(s), 9, 8))::BIGINT"
    f" + {c}) % {_SLOT_MOD}))"
    for a, b, c in _SLOT_ABC[:MINHASH_K]
)

_SQL_BANDS = ", ".join(
    "md5("
    + " || '|' || ".join(
        f"sig[{b * LSH_ROWS + r + 1}]::VARCHAR" for r in range(LSH_ROWS)
    )
    + ")"
    for b in range(LSH_BANDS)
)

_SQL_JACCARD = (
    "len(list_intersect(a.shingles, b.shingles))::DOUBLE / "
    "len(list_distinct(list_concat(a.shingles, b.shingles)))::DOUBLE"
)

# Shared CTE prefix: shingles → signatures → band table (mirrors
# with_shingles + minhash_signature + minhash_bands_from_shingles).
_SQL_BANDS_CTE = f"""
        sh AS (
            SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
        ),
        sig AS (
            SELECT doc_id, shingles, [{_SQL_SIG_ELEMS}] AS sig
            FROM sh WHERE len(shingles) > 0
        ),
        bands AS (
            SELECT doc_id, unnest(generate_series(0, {LSH_BANDS - 1})) AS band,
                   unnest([{_SQL_BANDS}]) AS band_hash
            FROM sig
        )
"""

# 16-bit simhash fingerprint query — feeds both the test-registry
# q_simhash check and the registered q_simhash_neardup oracle.
_SQL_SIMHASH16 = f"""
        WITH tok AS (
            SELECT doc_id,
                   list_transform({_SQL_TOKENS_LIST},
                                  t -> substr(md5(t), 1, {SIMHASH_BITS // 4})) AS hexes,
                   len({_SQL_TOKENS_LIST}) AS n
            FROM documents
        )
        SELECT doc_id,
               CAST({' + '.join(
                   f"(CASE WHEN 2 * list_sum(list_transform(hexes, "
                   f"h -> (strpos('0123456789abcdef', h[{j // 4 + 1}]) - 1) "
                   f"// {1 << (3 - j % 4)} % 2)) > n THEN {1 << j} ELSE 0 END)"
                   for j in range(SIMHASH_BITS)
               )} AS INTEGER) AS simhash
        FROM tok
    """

# Star construction mirror (lsh_candidate_pairs with max_bucket_size):
# buckets ≤ cap do the exact all-pairs join; hotter buckets emit
# (min doc_id ↔ member) star edges only. Both branches deduplicate into
# one candidate set before Jaccard verification.
_SQL_CAPPED_CAND = """
        sizes AS (
            SELECT band, band_hash, count(*) AS bsz, min(doc_id) AS brep
            FROM bands GROUP BY band, band_hash
        ),
        tagged AS (
            SELECT b.doc_id, b.band, b.band_hash, s.bsz, s.brep
            FROM bands b
            JOIN sizes s ON b.band = s.band AND b.band_hash = s.band_hash
        ),
        cand AS (
            SELECT DISTINCT id_a, id_b FROM (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b
                FROM tagged x
                JOIN tagged y
                  ON x.band = y.band AND x.band_hash = y.band_hash
                 AND x.doc_id < y.doc_id
                WHERE x.bsz <= {cap}
                UNION ALL
                SELECT brep AS id_a, doc_id AS id_b
                FROM tagged
                WHERE bsz > {cap} AND doc_id <> brep
            )
        )
"""

_SQL_VERIFY = f"""
        SELECT c.id_a, c.id_b, round({_SQL_JACCARD}, 4) AS jaccard
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b
        WHERE {_SQL_JACCARD} >= {JACCARD_THRESHOLD}
"""

# Exposed as a named constant: dedup.py's q_dedup_groups oracle embeds
# this pair query verbatim (same pair set on both engines ⇒ identical
# component structure), independent of which registry the pair query
# itself sits in.
MINHASH_PAIRS_ORACLE_SQL = f"""
    WITH {_SQL_BANDS_CTE},
    cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.band_hash = y.band_hash
         AND x.doc_id < y.doc_id
    )
    {_SQL_VERIFY}
"""

ORACLE = {
    "q_minhash_lsh_pairs_capped": f"""
        WITH {_SQL_BANDS_CTE},
        {_SQL_CAPPED_CAND.format(cap=_CAPPED_Q_BUCKET_SIZE)}
        {_SQL_VERIFY}
    """,
}

TEST_ORACLE = {
    "q_simhash": _SQL_SIMHASH16,
    "q_minhash_lsh_pairs": MINHASH_PAIRS_ORACLE_SQL,
    "q_jaccard_pairs": f"""
        WITH sh AS (
            SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
        ), nz AS (SELECT * FROM sh WHERE len(shingles) > 0)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round({_SQL_JACCARD}, 4) AS jaccard
        FROM nz a JOIN nz b ON a.doc_id < b.doc_id
        WHERE {_SQL_JACCARD} >= {JACCARD_THRESHOLD}
    """,
}


# 64-bit oracle: same strpos-hex-digit bit extraction as q_simhash, one
# 16-term sum per band, bands hex-formatted and concatenated (printf
# '%04x' == Spark lpad(lower(hex(band)), 4, '0') for 16-bit values).
def _sql_simhash64_band_int(k: int) -> str:
    """Band k of the 64-bit simhash as a plain integer expression (the
    bucket-join key of the capped near-dup oracle)."""
    return " + ".join(
        f"(CASE WHEN 2 * list_sum(list_transform(hexes, "
        f"h -> (strpos('0123456789abcdef', h[{J // 4 + 1}]) - 1) "
        f"// {1 << (3 - J % 4)} % 2)) > n THEN {1 << (15 - J % 16)} ELSE 0 END)"
        for J in range(16 * k, 16 * k + 16)
    )


def _sql_simhash64_band(k: int) -> str:
    return f"printf('%04x', {_sql_simhash64_band_int(k)})"


TEST_ORACLE["q_simhash64"] = f"""
    WITH tok AS (
        SELECT doc_id,
               list_transform({_SQL_TOKENS_LIST},
                              t -> substr(md5(t), 1, 16)) AS hexes,
               len({_SQL_TOKENS_LIST}) AS n
        FROM documents
    )
    SELECT doc_id,
           {" || ".join(_sql_simhash64_band(k) for k in range(SIMHASH64_BANDS))}
               AS simhash64
    FROM tok
"""

# The neardup oracle reuses the 16-bit fingerprint query verbatim, then
# mirrors the band construction exactly (same candidate set, no
# approximation gap between engines).
TEST_ORACLE["q_simhash_neardup"] = f"""
    WITH fp AS ({_SQL_SIMHASH16}),
    bands AS (
        SELECT doc_id, simhash,
               unnest([0, 1]) AS band,
               unnest([simhash >> {SIMHASH_BAND_BITS},
                       simhash & {(1 << SIMHASH_BAND_BITS) - 1}]) AS val
        FROM fp
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, bit_count(CAST(xor(sh_a, sh_b) AS BIGINT)) AS hamming
    FROM cand
    WHERE bit_count(CAST(xor(sh_a, sh_b) AS BIGINT)) <= {SIMHASH_HAM_MAX}
"""


# Capped 64-bit near-dup oracle: band ints (not hex) as bucket keys,
# then the SAME star construction as _SQL_CAPPED_CAND — buckets ≤ cap
# all-pairs, hotter buckets (min doc_id ↔ member) star edges — and
# Hamming verification by per-band xor+bit_count against the
# fingerprint table, mirroring the Spark candidates→verify shape.
_SQL_SIMHASH64_HAM = " + ".join(
    f"bit_count(CAST(xor(a.bands[{k + 1}], b.bands[{k + 1}]) AS BIGINT))"
    for k in range(SIMHASH64_BANDS)
)

ORACLE["q_simhash64_neardup_capped"] = f"""
    WITH tok AS (
        SELECT doc_id,
               list_transform({_SQL_TOKENS_LIST},
                              t -> substr(md5(t), 1, 16)) AS hexes,
               len({_SQL_TOKENS_LIST}) AS n
        FROM documents
    ),
    fp AS (
        SELECT doc_id,
               [{", ".join(_sql_simhash64_band_int(k)
                           for k in range(SIMHASH64_BANDS))}] AS bands
        FROM tok
    ),
    bands AS (
        SELECT doc_id,
               unnest(generate_series(0, {SIMHASH64_BANDS - 1})) AS band,
               unnest(bands) AS val
        FROM fp
    ),
    sizes AS (
        SELECT band, val, count(*) AS bsz, min(doc_id) AS brep
        FROM bands GROUP BY band, val
    ),
    tagged AS (
        SELECT b.doc_id, b.band, b.val, s.bsz, s.brep
        FROM bands b JOIN sizes s ON b.band = s.band AND b.val = s.val
    ),
    cand AS (
        SELECT DISTINCT id_a, id_b FROM (
            SELECT x.doc_id AS id_a, y.doc_id AS id_b
            FROM tagged x
            JOIN tagged y
              ON x.band = y.band AND x.val = y.val AND x.doc_id < y.doc_id
            WHERE x.bsz <= {_SIMHASH64_CAPPED_BUCKET_SIZE}
            UNION ALL
            SELECT brep AS id_a, doc_id AS id_b
            FROM tagged
            WHERE bsz > {_SIMHASH64_CAPPED_BUCKET_SIZE} AND doc_id <> brep
        )
    )
    SELECT c.id_a, c.id_b, CAST({_SQL_SIMHASH64_HAM} AS INTEGER) AS hamming
    FROM cand c
    JOIN fp a ON a.doc_id = c.id_a
    JOIN fp b ON b.doc_id = c.id_b
    WHERE {_SQL_SIMHASH64_HAM} <= {SIMHASH64_HAM_MAX}
"""
