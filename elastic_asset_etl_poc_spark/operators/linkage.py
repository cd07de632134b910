"""Record linkage: blocked fuzzy joins for entity resolution.

Matching dirty records (OCR'd catalogs, merged vendor feeds, scraped
duplicates) back to a canonical table is the entity-resolution step a
training-data pipeline runs before any per-entity aggregation — the
string-similarity sibling of the near-dup family (neardup.py does it for
documents by shingles, similarity.py for embeddings by cosine; this does
it for short strings by edit distance).

Scale shape: NEVER all-pairs.  Candidates come from an equi-join on
cheap exact blocking keys (brand+size, zip prefix, phonetic code, …), so
the quadratic edit-distance work is confined to within-block pairs —
the standard blocking design from the record-linkage literature
(Fellegi–Sunter framing; same candidate/verify split as MinHash-LSH).
Hot blocks are plain join skew, which AQE skew-join splitting subdivides
at runtime.  ``levenshtein`` is a JVM builtin (whole-stage codegen) —
no Python in the loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "blocked_fuzzy_join",
    "entity_clusters_incremental",
    "fs_linkage_weights",
]


def blocked_fuzzy_join(
    dirty: DataFrame,
    clean: DataFrame,
    block_cols: Sequence[str],
    dirty_text: str,
    clean_text: str,
    dirty_id: str,
    clean_id: str,
    max_dist: int = 2,
    keep: str = "best",
) -> DataFrame:
    """Link each dirty record to clean records in its block within
    ``max_dist`` edits → ``(dirty_id, clean_id, dist)``.

    ``keep='best'`` returns one row per matched dirty record — the
    minimum distance, ties broken by the smallest clean id (deterministic
    across engines and partitionings); ``keep='all'`` returns every
    candidate within the radius.  Dirty records with no candidate in
    radius are absent from the output (compose with a left-anti join to
    route them to a manual-review sink).

    Both sides must carry ``block_cols`` exactly (they are the join
    keys); the text columns are compared with Levenshtein distance.
    Rows with a NULL in any blocking key never match (standard equi-join
    NULL semantics) — intentional: a NULL blocking key would otherwise
    force the record against every block (all-pairs by the back door).
    Route NULL-keyed rows to a coarser blocking pass explicitly.
    """
    if keep not in ("best", "all"):
        raise ValueError(f"keep must be 'best' or 'all', got {keep!r}")
    d = dirty.select(
        F.col(dirty_id).alias("__did"),
        F.col(dirty_text).alias("__dtxt"),
        *block_cols,
    )
    c = clean.select(
        F.col(clean_id).alias("__cid"),
        F.col(clean_text).alias("__ctxt"),
        *block_cols,
    )
    # bounded levenshtein (threshold arg): the JVM kernel abandons a
    # pair as soon as its edit distance provably exceeds max_dist and
    # returns -1, so within-block pairs cost O(max_dist·len) instead of
    # O(len²) — measured 2.2× on the parts fixture with identical
    # results (distance values within the radius are unchanged)
    cand = (
        d.join(c, list(block_cols))
        .withColumn(
            "dist",
            F.levenshtein(F.col("__dtxt"), F.col("__ctxt"), max_dist),
        )
        .filter(F.col("dist") >= 0)
    )
    out = cand.select(
        F.col("__did").alias(dirty_id),
        F.col("__cid").alias(clean_id),
        F.col("dist").cast("int").alias("dist"),
    )
    if keep == "all":
        return out
    w = Window.partitionBy(dirty_id).orderBy(
        F.col("dist").asc(), F.col(clean_id).asc()
    )
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def entity_clusters_incremental(
    assignments: DataFrame,
    new_ids: DataFrame,
    delta_edges: DataFrame,
    id_col: str = "rid",
    cluster_col: str = "cluster",
    max_iter: int = 10,
    driver_limit: int = 1_000_000,
    emit: str = "all",
) -> DataFrame:
    """Fold a batch of NEW records (+ their match edges) into a standing
    entity clustering WITHOUT re-clustering the corpus →
    ``(id_col, cluster, is_survivor)`` over standing ∪ new.

    ``emit='all'`` returns the complete updated assignment table;
    ``emit='changed'`` returns ONLY the rows a store merge needs — the
    new records plus standing records whose cluster label changed (the
    apply_cdc-style upsert set).  Changed mode is the production shape
    at scale: the fold's OUTPUT is then O(batch + touched-cluster
    members) instead of O(corpus), so a batch arrival costs one
    filtering scan of the standing table and a small write, never a
    corpus-sized rewrite (measured in SCALE_r10.md's probe).

    The incremental trick is CLUSTER CONTRACTION: because the standing
    ``assignments`` are min-label canonical (``cluster`` = the smallest
    member id — exactly what ``neardup.dedup_survivors`` emits), each
    standing cluster can be contracted to one supernode named by its
    label, and connected components over the tiny QUOTIENT graph —
    nodes = new ids ∪ touched cluster labels, edges = ``delta_edges``
    with standing endpoints replaced by their labels — yields the same
    components as a full recompute over all records and all edges
    (contraction preserves connectivity; min over a merged component's
    labels ≡ min over its member ids since every label IS its cluster's
    min).  New edges may link new↔standing, new↔new, or
    standing↔standing (a late-arriving edge merging two old clusters).

    CONTRACTS: ``assignments`` must be min-label canonical and cover
    every standing record; an edge endpoint absent from ``assignments``
    is treated as a new id.  New ids must be disjoint from standing ids.
    ``delta_edges``'s endpoints are its FIRST TWO columns (the
    ``dedup_survivors`` pair contract).

    Scale shape (the reason this exists): a 100-TB corpus's clustering
    is touched only by (a) one stream of ``assignments`` past a
    BROADCAST of the small delta-edge frame (endpoint→label lookup, no
    corpus shuffle), and (b) one BROADCAST of the relabel map
    (old label → merged label, |touched clusters| rows) back over
    ``assignments``.  The CC itself runs on the quotient graph —
    O(batch + touched clusters) nodes, driver union-find under
    ``dedup_survivors``' broadcast limit — instead of O(corpus).
    """
    from .neardup import dedup_survivors

    if emit not in ("all", "changed"):
        raise ValueError(f"emit must be 'all' or 'changed', got {emit!r}")
    if len(delta_edges.columns) < 2:
        raise ValueError(
            "entity_clusters_incremental: delta_edges needs >=2 columns "
            f"(endpoints first), got {delta_edges.columns}"
        )
    a_col, b_col = delta_edges.columns[:2]
    lab = assignments.select(
        F.col(id_col).alias("__rid"), F.col(cluster_col).alias("__lab")
    )
    edges = delta_edges.select(
        F.col(a_col).alias("__a"), F.col(b_col).alias("__b")
    )
    # endpoint → supernode: standing ids take their cluster label, new
    # ids (absent from assignments) stay themselves.  The edge frame is
    # the small side — broadcast it so the corpus-sized assignments
    # stream past without a shuffle.
    q = (
        F.broadcast(edges)
        .join(lab.withColumnRenamed("__rid", "__a"), "__a", "left")
        .withColumn("__qa", F.coalesce("__lab", "__a"))
        .drop("__lab")
        .join(lab.withColumnRenamed("__rid", "__b"), "__b", "left")
        .withColumn("__qb", F.coalesce("__lab", "__b"))
        .select("__qa", "__qb")
    )
    # the quotient frame is |delta_edges|-sized but its LINEAGE contains
    # the corpus-wide label lookup; it is consumed several times below
    # (touched nodes, the CC's own multiple passes), so materialize it
    # once — this pins the fold at ~2 corpus scans total instead of ~6
    # (measured 8M-corpus fold: 9.0s → 5.0s, SCALE_r10.md probe)
    q = q.localCheckpoint(eager=True)
    touched = q.select(F.col("__qa").alias("__node")).unionByName(
        q.select(F.col("__qb").alias("__node"))
    )
    nodes = (
        new_ids.select(F.col(id_col).alias("__node"))
        .unionByName(touched)
        .distinct()
    )
    comp = dedup_survivors(
        nodes,
        q,
        id_col="__node",
        max_iter=max_iter,
        driver_limit=driver_limit,
    ).select(F.col("__node"), F.col("cluster").alias("__merged"))
    # relabel standing clusters whose label participated in the quotient
    # graph; the map is |touched clusters|-sized → broadcast
    relabel = comp.withColumnRenamed("__node", "__old")
    if emit == "changed":
        # upsert set only: standing rows whose label actually moves
        # (inner join against the broadcast map + strict change filter)
        standing = (
            assignments.join(
                F.broadcast(relabel),
                F.col(cluster_col) == F.col("__old"),
            )
            .filter(F.col("__merged") != F.col(cluster_col))
            .select(F.col(id_col), F.col("__merged").alias(cluster_col))
        )
    else:
        standing = (
            assignments.join(
                F.broadcast(relabel),
                F.col(cluster_col) == F.col("__old"),
                "left",
            )
            .select(
                F.col(id_col),
                F.coalesce("__merged", F.col(cluster_col)).alias(
                    cluster_col
                ),
            )
        )
    fresh = new_ids.select(F.col(id_col)).join(
        F.broadcast(comp), F.col(id_col) == F.col("__node"), "left"
    ).select(
        F.col(id_col),
        # a new id with no delta edge is its own singleton cluster
        F.coalesce("__merged", F.col(id_col)).alias(cluster_col),
    )
    return standing.unionByName(fresh).withColumn(
        "is_survivor", F.col(id_col) == F.col(cluster_col)
    )


def fs_linkage_weights(
    cands: DataFrame,
    agree_cols: Sequence[str],
    truth_col: str,
    clamp: tuple = (0.01, 0.99),
) -> DataFrame:
    """Fellegi–Sunter probabilistic linkage scoring: weight each
    candidate pair by per-field agreement log-likelihood ratios →
    the input columns plus ``score``.

    For each comparison field f (a BOOLEAN agreement column), the
    m-probability ``m_f = P(agree | match)`` is estimated from the pairs
    flagged by ``truth_col`` (a labeled/derived match subset — review
    samples, shared-key twins, a previous round's survivors) and the
    u-probability ``u_f = P(agree | non-match)`` from the remaining
    pairs (the classical random-pair approximation).  A pair's score is
    the sum over fields of ``log2(m_f/u_f)`` when the field agrees and
    ``log2((1-m_f)/(1-u_f))`` when it disagrees — the Fellegi–Sunter
    decision statistic (1969 JASA framing; agreement weights positive,
    disagreement weights negative).  Probabilities are clamped into
    ``clamp`` so a perfectly-agreeing field keeps a finite disagreement
    weight (the standard guard against log of zero).

    NULL agreement values count as NON-agreement in both the estimates
    and the scoring (explicit ``<=>``-style handling so a missing field
    never propagates NULL into the score).

    Scale shape: ONE global aggregation reduces the candidate frame to a
    single stats row (conditional means — associative partials), which
    is broadcast back with a literal-free cross join; scoring is then a
    per-row expression.  Candidates are assumed pre-blocked
    (blocked_fuzzy_join or any candidate generator) — this operator adds
    no join, no shuffle beyond the one-row agg.

    The candidate frame feeds BOTH the stats agg and the scoring probe;
    without materialization Catalyst duplicates the subtree and the
    generator (typically a blocked fuzzy join running a bounded
    edit-distance kernel per pair) executes TWICE per action — measured
    on linkage_weights_parts at sf0.1: 6.8 → 3.3 s exec once the frame
    is lazily checkpointed here.  One candidate-frame materialization is
    also the right trade at 100 TB: candidates are blocked (bounded,
    a small multiple of the dirty side), while the duplicated subtree
    costs a full second pass of the similarity kernel.
    """
    lo, hi = clamp
    cands = cands.localCheckpoint(eager=False)
    t = F.coalesce(F.col(truth_col), F.lit(False))
    stats = cands.agg(
        *[
            F.avg(
                F.when(t, F.coalesce(F.col(c), F.lit(False)).cast("double"))
            ).alias(f"__m_{c}")
            for c in agree_cols
        ],
        *[
            F.avg(
                F.when(~t, F.coalesce(F.col(c), F.lit(False)).cast("double"))
            ).alias(f"__u_{c}")
            for c in agree_cols
        ],
    )

    def _clamped(col: str):
        # a truth/complement class absent from the data (no labeled
        # matches, or all pairs labeled) leaves avg() NULL → fall back
        # to an uninformative 0.5 before clamping
        return F.least(
            F.greatest(F.coalesce(F.col(col), F.lit(0.5)), F.lit(lo)),
            F.lit(hi),
        )

    score = None
    for c in agree_cols:
        m, u = _clamped(f"__m_{c}"), _clamped(f"__u_{c}")
        agree = F.coalesce(F.col(c), F.lit(False))
        w = F.when(agree, F.log2(m / u)).otherwise(
            F.log2((1 - m) / (1 - u))
        )
        score = w if score is None else score + w
    return (
        cands.join(F.broadcast(stats))
        .withColumn("score", score)
        .drop(*[f"__m_{c}" for c in agree_cols])
        .drop(*[f"__u_{c}" for c in agree_cols])
    )
