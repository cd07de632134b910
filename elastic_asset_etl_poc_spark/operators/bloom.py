"""Distributed Bloom-filter build + probe-side pruning, entirely in
DataFrame expressions.

The 100-TB join problem this solves: a semi-join whose build side is too
big to broadcast as a key SET still admits a KB-sized broadcast of its
Bloom SUMMARY.  Probe rows that fail the membership test are dropped
map-side — *before* the sort-merge shuffle — so the exchange moves only
the (tiny) surviving fraction plus false positives.  Spark itself does
this opportunistically (runtime row-level filtering, SPARK-32268), but
the injected `bloom_filter_agg` expression is internal-only and its
trigger heuristics are opaque; this operator states the pattern
explicitly so a pipeline can rely on it.

Construction (all JVM-side, whole-stage codegen; zero Python UDFs):

  * k hash functions by Kirsch-Mitzenmacher double hashing over
    ``xxhash64``: ``g_i = h1 + i * h2 (mod m)`` with
    ``h1 = xxhash64(key)`` and ``h2 = xxhash64(key, salt)`` — two real
    hashes fan out to any k with no quality cliff (Kirsch & Mitzenmacher,
    "Less Hashing, Same Performance", ESA 2006).
  * build: keys → k bit positions → groupBy(word = pos >> 6) →
    ``bit_or(1 << (pos & 63))`` → one row holding a
    ``map<int, bigint>`` of non-zero words.  Both the position frame
    (≤ k·n rows of ints) and the word map (≤ m/64 entries) are tiny
    regardless of probe volume; the bitmap for m = 2^16 bits is 8 KiB.
  * probe: the one-row word map is collected (a bounded, O(m/64)
    driver action — the bitmap exists precisely to be shipped) and
    densified into an ``array<bigint>`` LITERAL, then the probe filter
    ANDs k codegen'd bit tests ``element_at(arr, word+1) & bit != 0``.
    Embedding the bitmap as a literal instead of a one-row crossJoin is
    deliberate: with a crossJoin, Catalyst legally reorders the scrub
    semi-join BELOW the cross join (the filter references the joined
    ``bf`` column, so it cannot sink past it), which runs the bloom test
    AFTER the shuffle it exists to prevent; a literal predicate stays
    glued to the probe scan.  This is the same ship-the-summary-into-
    the-query move as the reference's phase-1 IN-list, with a
    constant-size summary instead of a key list.

Bloom filters have false positives but NO false negatives, so
``bloom_semi_join`` re-checks survivors with an exact semi-join: the
result is bit-identical to a plain semi-join (that is the oracle), the
bloom stage only changes WHERE rows die.  ``tests/test_operators.py``
property-checks zero-false-negative and pruning selectivity;
``tests/test_plans_physical.py`` asserts the bloom Filter sits BELOW the
probe-side Exchange in the sort-merge plan — prune-before-shuffle is the
entire point, and a plan where it floats above the exchange is a
regression even if results match.

Reference parity: extends the reference's two-phase IN-list semi-join
(lib/collectServicesFromSummaries.ts:209-215) to build sides that no
longer fit an IN-list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default filter geometry: m = 2^16 bits (8 KiB bitmap), k = 7 hashes.
#: FPP ≈ (1 - e^(-k n / m))^k — for n = 5 000 keys: ~0.0009.
DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 7

#: auto-sizing bounds: ~12 bits/key targets ≈0.1-0.3% FPP; the cap at
#: 2^22 bits (512 KiB bitmap, 64 Ki longs) keeps the embedded literal
#: broadcast-sized — beyond ~350 K build keys FPP degrades gracefully
#: (the exact scrub keeps results correct regardless) and a deployment
#: would shard the filter or raise the cap instead.
BITS_PER_KEY = 12
MIN_M_BITS = 1 << 10
MAX_M_BITS = 1 << 22

_SALT = 0x9E3779B9  # golden-ratio constant, any fixed odd salt works


def bloom_params(n_keys: int) -> tuple[int, int]:
    """Filter geometry for ``n_keys`` build keys: the smallest power-of-
    two m ≥ BITS_PER_KEY·n (clamped), and the FPP-optimal k = m/n·ln 2
    (clamped to [1, 12]).  A fixed default geometry SATURATES when the
    build side outgrows it — n ≫ m drives FPP toward 1 and the prune
    silently becomes a no-op (measured: 300 K keys against the 2^16
    default pass 100% of a 6 M-row probe) — so size from n, always."""
    import math

    n = max(int(n_keys), 1)
    m = MIN_M_BITS
    while m < n * BITS_PER_KEY and m < MAX_M_BITS:
        m <<= 1
    k = min(12, max(1, round(m / n * math.log(2))))
    return m, k


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k Kirsch-Mitzenmacher bit positions of ``key`` in [0, m).

    Both hashes are reduced mod m BEFORE the ``h1 + i*h2`` combination:
    ANSI mode makes the raw 64-bit multiply an overflow error, and since
    (a + i·b) mod m == ((a mod m) + i·(b mod m)) mod m the reduction is
    exact, keeping every intermediate under k·m."""
    h1 = F.pmod(F.xxhash64(key), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(_SALT)), F.lit(m_bits))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def bloom_build(
    build: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Aggregate ``build[key_col]`` into a one-row Bloom bitmap frame
    with a single column ``bf: map<int, bigint>`` (word index → 64-bit
    word, zero words omitted).

    Scale shape: one projection to k positions (map-only, exploded),
    one groupBy on ≤ m/64 distinct words with a map-side-combining
    ``bit_or``, one single-group ``map_from_entries`` collapse.  The
    build side streams through once; nothing about the output size
    depends on n.
    """
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    pos = (
        build.select(
            F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias(
                "pos"
            )
        )
        .groupBy(F.shiftright(F.col("pos"), 6).cast("int").alias("word"))
        .agg(
            F.bit_or(
                # call_function: F.shiftleft only takes a literal count
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    F.pmod(F.col("pos"), F.lit(64)).cast("int"),
                )
            ).alias("bits")
        )
    )
    return pos.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("word", "bits")))
        ).alias("bf")
    )


def bloom_densify(bf_df: DataFrame, m_bits: int = DEFAULT_M_BITS) -> list[int]:
    """Collect the one-row word map into a dense ``m_bits/64``-long word
    list (index = word number).  The collect is bounded by the filter
    geometry (8 KiB at the default m), never by build-side rows."""
    words = bf_df.collect()[0]["bf"] or {}
    dense = [0] * (m_bits >> 6)
    for w, bits in words.items():
        dense[w] = bits
    return dense


def bloom_might_contain(
    words: list[int],
    key: Column,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> Column:
    """Membership predicate: all k bits of ``key`` set in the dense word
    list (from :func:`bloom_densify`), embedded as an array literal.

    Pure builtin expressions (element_at / shiftleft / bitwiseAND) over
    a literal array, so the test is a plain probe-side predicate running
    inside whole-stage codegen at scan rate — and, critically, one the
    optimizer keeps below the probe's exchange.

    Literal-size note (measured, r14): ``F.lit(list)`` on PySpark 4.x
    produces ONE compact array literal even at production m (65,536
    words) — generated code size and steady-state scan rate are
    IDENTICAL to a from_json-folded alternative (controlled fresh-JVM
    A/B, 3-run medians 1.4 s both forms on the 60 M-row sf1 probe).
    An early one-shot reading blamed this literal for a 15× slowdown;
    the controlled experiment refuted that — the outlier was cold-JIT
    first-run variance, the class tools/sf1_scale_smoke.py's
    warm-first protocol now removes from measurements."""
    arr = F.lit(words).cast("array<bigint>")

    def _bit_set(p):
        word = F.shiftright(p, 6).cast("int")
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int")
        )
        return F.element_at(arr, word + F.lit(1)).bitwiseAND(bit) != F.lit(0)

    # forall over the position array embeds the bitmap literal ONCE in
    # the plan; k chained tests would clone the full array k times into
    # the expression tree (64 Ki longs × 12 copies at the size cap).
    return F.forall(F.array(*_positions(key, m_bits, k)), _bit_set)


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """Exact left-semi join accelerated by a bloom pre-filter.

    Equivalent to ``probe SEMI JOIN build`` row-for-row: the bloom stage
    admits every true match (no false negatives) plus ~FPP of the
    non-matches, and the exact semi-join scrubs the false positives.
    What changes is the plan: the probe side is pruned map-side BEFORE
    the semi-join's exchange, which at 100 TB is the difference between
    shuffling the full fact table and shuffling the matching sliver.
    """
    bk = build_key or probe_key
    # ONE build-side scan: the distinct key frame feeds the sizing
    # count, the bitmap aggregate, AND the exact scrub join — lazily it
    # would be recomputed (scan + distinct shuffle) for each, three
    # passes where one materialization suffices (r13 bench: three
    # documented build passes; this folds them)
    keys = (
        build.select(F.col(bk).alias("__bloom_bk"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if m_bits is None or k is None:
        # size the filter from the actual key count — free off the
        # materialized frame; a fixed geometry saturates on large
        # build sides, see bloom_params
        auto_m, auto_k = bloom_params(keys.count())
        m_bits = m_bits or auto_m
        k = k or auto_k
    words = bloom_densify(
        bloom_build(keys.withColumnRenamed("__bloom_bk", bk), bk, m_bits, k),
        m_bits,
    )
    pruned = probe.filter(
        bloom_might_contain(words, F.col(probe_key), m_bits, k)
    )
    return pruned.join(
        keys, on=pruned[probe_key] == keys["__bloom_bk"], how="left_semi"
    )
