"""Approximate string matching (entity resolution) — blocked
edit-distance joins.

Extension scope (no fuzzy matching in the reference — its only string
op is ``.lower()``, etl_job.py:126): the operator a training-data or
MDM pipeline needs to reconcile near-identical names/titles without a
quadratic comparison. Same architecture as the Jaccard near-dup path
(operators/dedup.jaccard_pairs_blocked): cheap blocking generates
candidates, an exact verifier scores them — here Levenshtein with a
threshold so the JVM-side dynamic program can early-exit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def fuzzy_string_pairs_blocked(
    df: DataFrame,
    name_col: str,
    max_distance: int = 2,
    q: int = 4,
) -> DataFrame:
    """Distinct-value pairs of ``name_col`` within Levenshtein
    ``max_distance``, via PROVABLY COMPLETE candidate blocking + exact
    verification (the earlier shared-token blocking could miss a pair
    whose edits touched every token — ADVICE r4).

    Returns (name_a, name_b, edit_distance, n_a, n_b) with
    name_a < name_b; n_* are the input multiplicities, so downstream
    can expand back to row-level matches without re-verifying.

    Stages (no cartesian product anywhere):

    1. DISTINCT-FIRST: collapse rows to (name, count). At scale this
       is the load-bearing step — a 10^10-row table with 10^6 distinct
       names turns into a 10^6-row matching problem before any pair
       work happens.
    2. BLOCK, long strings — Ed-Join prefix filtering (Xiao et al.,
       VLDB'08): each name with ≥ q·d+1 positional q-grams keeps only
       its q·d+1 RAREST grams (global ascending document frequency —
       one edit destroys at most q grams, so d edits cannot destroy
       an entire (q·d+1)-prefix under any fixed global order);
       candidates are the posting self-join on the prefix grams with
       the positional constraint |pos_a − pos_b| ≤ d (a surviving
       gram cannot shift further than the edit count).
    3. BLOCK, short strings — symmetric-delete neighborhoods
       (SymSpell): every name shorter than q·d+q+d explodes into all
       variants reachable by ≤ d single-character deletions
       (C(len, ≤d) variants — bounded because the strings are short);
       two strings within edit distance d always share a ≤d-deletion
       variant. Any pair the gram prefix can't guarantee has BOTH
       sides under this cap (the guarantee only fails when
       min-length < q·d+q, and the partner is within d of that), so
       the union of the two candidate sets is complete at ANY d —
       pinned against brute force in tests/test_operators.py,
       including the all-tokens-edited case that escaped the old
       token blocking.
    4. LENGTH FILTER: |len(a) − len(b)| ≤ d is necessary for
       edit distance ≤ d; evaluated INSIDE both candidate joins (the
       hash-join's residual filter), so over-length pairs are dropped
       before they ever reach the candidate-dedup shuffle.
    5. VERIFY: ``levenshtein(a, b, threshold=d)`` — Spark's
       thresholded form returns −1 past d, so the DP row can abandon
       early; exact distances for everything kept.

    Cost note (measured, part names sf0.1): ~0.5 s vs 0.37 s for the
    old incomplete token blocking — the rarest-first rank window is
    the added shuffle. A positional first-(q·d+1+d) prefix (no df, no
    window) measured ~0.42 s and is equally complete, but buckets on
    LEADING grams, which skew badly on real name corpora
    ("INTERNATIONAL …"); rarity ordering adapts per name, so it is
    the default. q trades gram rarity against the short-string cap
    (q·d+q+d): larger q rarefies long-string buckets but routes more
    of the vocabulary through the delete-neighborhood path.
    """
    d = max_distance
    min_long = q * d + q          # length giving ≥ q·d+1 grams
    short_cap = q * d + q + d     # partners of non-guaranteed pairs

    names = df.groupBy(name_col).agg(F.count("*").alias("__n")).select(
        F.col(name_col).alias("__name"), "__n")

    # -- long path: Ed-Join rarest-first positional gram prefixes --
    grams = (
        names.where(F.length("__name") >= min_long)
        .select(
            "__name", "__n",
            F.explode(F.sequence(
                F.lit(1), F.length("__name") - (q - 1))).alias("__p"))
        .withColumn("__g", F.expr(f"substr(__name, __p, {q})"))
    )
    gram_df = grams.groupBy("__g").agg(F.count("*").alias("__df"))
    w = Window.partitionBy("__name").orderBy("__df", "__g", "__p")
    prefix = (
        grams.join(gram_df, "__g")
        .withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= q * d + 1)
        .select("__name", "__n", "__g", "__p")
    )
    pa, pb = prefix.alias("a"), prefix.alias("b")
    cand_long = (
        pa.join(
            pb,
            (F.col("a.__g") == F.col("b.__g"))
            & (F.abs(F.col("a.__p") - F.col("b.__p")) <= d)
            & (F.abs(F.length(F.col("a.__name"))
                     - F.length(F.col("b.__name"))) <= d)
            & (F.col("a.__name") < F.col("b.__name")),
        )
        .select(
            F.col("a.__name").alias("name_a"), F.col("a.__n").alias("n_a"),
            F.col("b.__name").alias("name_b"), F.col("b.__n").alias("n_b"),
        )
    )

    # -- short path: symmetric-delete neighborhoods --
    variants = names.where(F.length("__name") < short_cap).select(
        "__name", "__n", F.col("__name").alias("__v"))
    one_deletion = F.expr(
        "transform(sequence(1, greatest(length(__v), 1)),"
        " i -> concat(substr(__v, 1, i - 1),"
        "             substr(__v, i + 1, length(__v))))")
    for _ in range(d):
        variants = (
            variants.select(
                "__name", "__n",
                F.explode(F.array_union(F.array("__v"), one_deletion))
                .alias("__v"))
            .distinct()
        )
    va, vb = variants.alias("a"), variants.alias("b")
    cand_short = (
        va.join(
            vb,
            (F.col("a.__v") == F.col("b.__v"))
            & (F.abs(F.length(F.col("a.__name"))
                     - F.length(F.col("b.__name"))) <= d)
            & (F.col("a.__name") < F.col("b.__name")),
        )
        .select(
            F.col("a.__name").alias("name_a"), F.col("a.__n").alias("n_a"),
            F.col("b.__name").alias("name_b"), F.col("b.__n").alias("n_b"),
        )
    )

    cand = cand_long.unionByName(cand_short).distinct()
    verified = (
        cand
        .withColumn(
            "edit_distance",
            F.levenshtein("name_a", "name_b", d),
        )
        .where(F.col("edit_distance") >= 0)
    )
    return verified.select("name_a", "name_b", "edit_distance", "n_a", "n_b")
