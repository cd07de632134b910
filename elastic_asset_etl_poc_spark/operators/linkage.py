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

__all__ = ["blocked_fuzzy_join"]


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
    cand = (
        d.join(c, list(block_cols))
        .withColumn("dist", F.levenshtein(F.col("__dtxt"), F.col("__ctxt")))
        .filter(F.col("dist") <= max_dist)
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
