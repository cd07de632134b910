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

Construction (all JVM-side, whole-stage codegen; zero Python UDFs).
The filter is REGISTER-BLOCKED (Putze, Sanders & Singler, "Cache-,
Hash- and Space-Efficient Bloom Filters", WEA 2007 — the design behind
Parquet's split-block bloom filters): each key owns ONE 64-bit word
picked by ``h1 mod nwords``, and its k bits all live INSIDE that word
at positions cut from 6-bit slices of ``h2 = xxhash64(key, salt)``.

  * build: keys → (word index, 64-bit mask) → ``groupBy(word)`` →
    ``bit_or(mask)`` → one row holding a ``map<int, bigint>`` of
    non-zero words.  Map-side combinable; output ≤ m/64 entries
    regardless of build rows; the bitmap for m = 2^17 bits is 16 KiB.
  * probe: the one-row word map is collected (a bounded, O(m/64)
    driver action — the bitmap exists precisely to be shipped),
    densified, folded into ONE ``array<bigint>`` literal JVM-side (a
    single byte[] py4j transfer + ``functions.lit(long[])`` — never an
    element-wise ``F.lit(list)``), and the filter is a single
    codegen'd test ``element_at(arr, word+1) & mask == mask``.

  Why blocked instead of the textbook k-probe layout — the r15
  forensics, each cost measured on the 6 M-row sf1 probe at the
  auto-sized 2^22-bit geometry (full query, warm best-of-N):

  * ``F.forall`` over the k positions: higher-order functions are
    ``CodegenFallback``, and CollapseCodegenStages refuses to wrap any
    stage containing one — the scan+filter+exchange probe stage ran
    fully INTERPRETED (33–41 s; a scan-only microbenchmark hid it at
    1.9 s, which is how the r14 A/B — comparing two literal FORMS both
    under forall — concluded "identical").
  * k chained AND bit-tests: codegen returns, but each of the k
    occurrences of the 64 Ki-long literal costs O(m) in Catalyst
    canonicalization per optimizer/AQE pass → ~14 s of DRIVER time
    per query construction.  ``F.lit(list)`` construction itself is
    65 536 py4j round trips (~30 s); from_json / parsed-SQL literal
    forms fix construction but re-lose codegen (JsonToStructs is
    CodegenFallback) or blow up the parser.
  * blocked layout: ONE literal occurrence, ONE element_at per row,
    mask arithmetic in registers → 1.4 s end-to-end, FPP 0.63%
    measured at 16 bits/key.  The blocked penalty (all k bits in one
    word collide more) costs ~2-4× the ideal FPP at equal bits/key —
    BITS_PER_KEY is 16 (was 12) to buy it back; false positives only
    cost scrub work, never correctness.

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

#: default filter geometry: m = 2^17 bits (16 KiB bitmap), k = 6 bits
#: inside the key's one word.  Blocked-filter FPP for n keys ≈
#: (1 - (1 - k/(64·nwords))^n·... ) — in practice ~(load/64)^k_distinct
#: per word; for n = 5 000 at this geometry measured ~2e-4.
DEFAULT_M_BITS = 1 << 17
DEFAULT_K = 6

#: auto-sizing bounds: 16 bits/key targets ≈0.5-1% FPP for the BLOCKED
#: layout (2-4× the ideal-bloom FPP at equal budget — the price of the
#: one-word, one-element_at probe); the cap at 2^22 bits (512 KiB
#: bitmap, 64 Ki longs) keeps the embedded literal broadcast-sized —
#: beyond ~260 K build keys FPP degrades gracefully (the exact scrub
#: keeps results correct regardless) and a deployment would shard the
#: filter or raise the cap instead.
BITS_PER_KEY = 16
MIN_M_BITS = 1 << 10
MAX_M_BITS = 1 << 22

_SALT = 0x9E3779B9  # golden-ratio constant, any fixed odd salt works


def bloom_params(n_keys: int) -> tuple[int, int]:
    """Filter geometry for ``n_keys`` build keys: the smallest power-of-
    two m ≥ BITS_PER_KEY·n (clamped), and k in-word bits ≈ m/n·ln 2
    clamped to [1, 6] — beyond ~6 bits inside one 64-bit word the
    intra-word collisions eat the gain.  A fixed default geometry
    SATURATES when the build side outgrows it — n ≫ m drives FPP
    toward 1 and the prune silently becomes a no-op (measured: 300 K
    keys against the 2^16 default pass 100% of a 6 M-row probe) — so
    size from n, always."""
    import math

    n = max(int(n_keys), 1)
    m = MIN_M_BITS
    while m < n * BITS_PER_KEY and m < MAX_M_BITS:
        m <<= 1
    k = min(6, max(1, round(m / n * math.log(2))))
    return m, k


def _word_and_mask(key: Column, m_bits: int, k: int) -> tuple[Column, Column]:
    """The blocked-bloom coordinates of ``key``: (word index in
    [0, m/64), 64-bit mask of its k in-word bits).

    ``h1 mod nwords`` picks the word; the mask ORs ``1 << b_i`` with
    each ``b_i`` a 6-bit slice of ``h2`` (slices i·6..i·6+5, so k ≤ 6
    stays inside h2's low 36 bits — untouched by the arithmetic
    ``shiftright`` sign extension).  Two independent xxhash64 draws,
    the Kirsch-Mitzenmacher discipline applied block-wise.  All
    arithmetic is int/long-range safe under ANSI mode."""
    if k > 10:
        # slices i ≥ 10 read past h2's bit 63 into sign-extension bits
        # (constant 0 or 63), silently biasing the mask: FPP quality
        # collapses while correctness holds (probe stays symmetric).
        # bloom_params clamps to 6; a caller passing an old k=7..12
        # default must hear about it, not degrade unnoticed.
        raise ValueError(
            f"blocked bloom supports at most 10 in-word bit slices, got k={k}; "
            "use bloom_params() (clamps to 6 — beyond that intra-word "
            "collisions eat the gain anyway)"
        )
    nwords = m_bits >> 6
    word = F.pmod(F.xxhash64(key), F.lit(nwords)).cast("int")
    h2 = F.xxhash64(key, F.lit(_SALT))
    mask = None
    for i in range(k):
        b = F.pmod(F.shiftright(h2, 6 * i), F.lit(64)).cast("int")
        t = F.call_function("shiftleft", F.lit(1).cast("long"), b)
        mask = t if mask is None else mask.bitwiseOR(t)
    return word, mask


def bloom_build(
    build: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Aggregate ``build[key_col]`` into a one-row Bloom bitmap frame
    with a single column ``bf: map<int, bigint>`` (word index → 64-bit
    word, zero words omitted).  Blocked layout: each key contributes
    its full k-bit mask to exactly ONE word.

    Scale shape: one map-only projection to (word, mask) — no explode,
    one row per key — one groupBy on ≤ m/64 distinct words with a
    map-side-combining ``bit_or``, one single-group
    ``map_from_entries`` collapse.  The build side streams through
    once; nothing about the output size depends on n.
    """
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    word, mask = _word_and_mask(F.col(key_col), m_bits, k)
    pos = (
        build.select(word.alias("word"), mask.alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return pos.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("word", "bits")))
        ).alias("bf")
    )


def bloom_densify(bf_df: DataFrame, m_bits: int = DEFAULT_M_BITS) -> list[int]:
    """Collect the one-row word map into a dense ``m_bits/64``-long word
    list (index = word number).  The collect is bounded by the filter
    geometry (16 KiB at the default m), never by build-side rows."""
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
    """Membership predicate: ALL k in-word bits of ``key`` set in its
    one word of the dense word list (from :func:`bloom_densify`),
    embedded as a single folded array literal —
    ``element_at(arr, word + 1) & mask == mask``.

    Pure builtin expressions (element_at / shiftleft / bitwiseAND), NO
    higher-order functions, and exactly ONE occurrence of the bitmap
    literal in the expression tree — each of those is load-bearing
    (module docstring has the measured forensics): a ``forall`` is
    CodegenFallback and costs the whole probe stage its WholeStageCodegen
    wrap; k chained tests embed the 64 Ki-long literal k times and
    Catalyst canonicalization walks O(m) per occurrence per
    optimizer/AQE pass (~14 s of driver time at the 2^22 geometry);
    the blocked one-word probe needs the literal once, runs inside
    codegen at scan rate, and the optimizer keeps it below the probe's
    exchange."""
    arr = _fold_words_literal(words)
    word, mask = _word_and_mask(key, m_bits, k)
    return F.element_at(arr, word + F.lit(1)).bitwiseAND(mask) == mask


def _fold_words_literal(words: list[int]) -> Column:
    """ONE folded ``array<bigint>`` literal from a Python word list, in
    O(1) py4j calls: pack the words into a single byte payload (py4j
    fast-paths ``bytes`` to ``byte[]`` in one binary frame), decode
    JVM-side via ``ByteBuffer.asLongBuffer().get(long[])``, and wrap
    with Scala ``functions.lit(long[])`` — the same folded
    UnsafeArrayData literal ``F.lit(list)`` yields, WITHOUT its
    per-element construction: PySpark's ``F.lit(list)`` lowers to
    ``array(*[lit(x) for x in xs])``, one py4j round trip per element
    (measured ~30 s at 64 Ki words; this path: 0.03 s).  Falls back to
    ``F.lit`` when the py4j gateway is unavailable (Spark Connect)."""
    try:
        import struct

        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        gw = spark.sparkContext._gateway
        payload = struct.pack("<%dq" % len(words), *words)
        buf = (
            gw.jvm.java.nio.ByteBuffer.wrap(payload)
            .order(gw.jvm.java.nio.ByteOrder.LITTLE_ENDIAN)
            .asLongBuffer()
        )
        jarr = gw.new_array(gw.jvm.long, len(words))
        buf.get(jarr)
        return Column(gw.jvm.org.apache.spark.sql.functions.lit(jarr))
    except Exception as exc:  # noqa: BLE001 — see warning below
        # gateway-less sessions (Spark Connect) land here by design,
        # but their exact error class is environment-dependent
        # (sparkContext/_gateway access), so the except stays broad —
        # and therefore LOUD: a typo'd JVM path or py4j API change
        # reintroduces the ~30 s per-element F.lit(list) construction
        # cliff this function exists to avoid, and the warning is the
        # signal that used to be missing
        import warnings

        warnings.warn(
            f"bloom bitmap literal fold fell back to per-element F.lit "
            f"({len(words)} words — ~30 s at 64 Ki): {exc!r}",
            RuntimeWarning,
            stacklevel=2,
        )
        return F.lit(words).cast("array<bigint>")


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
