"""Fuzzy center/name resolution (reference J4, W4) as a similarity join.

Reference: alias map -> exact normalized match -> SequenceMatcher
best-match >= 0.85 -> create/raise
(redcap-pipeline/services/center_resolver.py:44-160, threshold at
redcap-pipeline/core/config.py:70-73).

Spark-first design: the dimension (centers; here any small name table)
is broadcast; distinct dirty names cross-join it, a similarity score
ranks candidates, row_number picks the top match per name, filtered at
the threshold. The cross join is |distinct names| x |dim| — the dim is
tiny (83 centers in the reference), so this is a broadcast
nested-loop over a few thousand rows per partition: no shuffle of the
fact table at any scale; the fact table only ever equi-joins the
resolved (name -> id) map afterwards.

Similarity: the reference uses difflib.SequenceMatcher.ratio()
(Ratcliff-Obershelp). We substitute the documented Levenshtein ratio
1 - lev(a,b)/max(len) with the same 0.85 threshold (SURVEY.md §7.3) —
levenshtein() is a JVM built-in, keeping the join codegen'd; a
SequenceMatcher-parity Python UDF would force row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from idhub_spark.functions.expressions import normalize_name_expr

DEFAULT_THRESHOLD = 0.85


def levenshtein_ratio(a: Column, b: Column) -> Column:
    """1 - levenshtein/max(len), in [0,1]; 1.0 for exact match."""
    m = F.greatest(F.length(a), F.length(b))
    return F.when(m == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b).cast("double") / m.cast("double")
    )


def fuzzy_match_names(
    dirty: DataFrame,
    dim: DataFrame,
    *,
    dirty_col: str,
    dim_name_col: str,
    dim_id_col: str,
    aliases: DataFrame | None = None,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Resolve each distinct dirty name to the best dim row.

    Returns (name=<original dirty value>, matched_id, matched_name,
    score, match_strategy) where match_strategy is
    alias | exact | fuzzy | none (center_resolver.py:44-160 order).

    aliases: optional (alias, <dim_id_col>) mapping checked first.
    """
    names = (
        dirty.select(F.col(dirty_col).alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        .withColumn("_norm", normalize_name_expr(F.col("name")))
    )
    d = dim.select(
        F.col(dim_id_col).alias("matched_id"),
        F.col(dim_name_col).alias("matched_name"),
        normalize_name_expr(F.col(dim_name_col)).alias("_dnorm"),
    )

    # 1) alias map (broadcast equi-join)
    if aliases is not None:
        al = aliases.select(
            normalize_name_expr(F.col("alias")).alias("_norm"),
            F.col(dim_id_col).alias("_alias_id"),
        )
        names = names.join(F.broadcast(al), "_norm", "left")
    else:
        names = names.withColumn("_alias_id", F.lit(None).cast("long"))

    # 2) exact normalized match (broadcast equi-join)
    exact = d.select(F.col("_dnorm").alias("_norm"), F.col("matched_id").alias("_exact_id"))
    names = names.join(F.broadcast(exact), "_norm", "left")

    # 3) fuzzy: broadcast cross join + top-1 window (W4)
    unresolved = names.filter(F.col("_alias_id").isNull() & F.col("_exact_id").isNull())
    scored = unresolved.crossJoin(F.broadcast(d)).withColumn(
        "score", levenshtein_ratio(F.col("_norm"), F.col("_dnorm"))
    )
    w = Window.partitionBy("_norm").orderBy(F.desc("score"), F.asc("matched_id"))
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("score") >= threshold))
        .select("_norm", F.col("matched_id").alias("_fuzzy_id"), F.col("score").alias("_fscore"))
    )
    names = names.join(best, "_norm", "left")

    dim_lookup = d.select(F.col("matched_id").alias("_mid"), "matched_name")
    resolved_id = F.coalesce("_alias_id", "_exact_id", "_fuzzy_id")
    return (
        names.withColumn("_mid", resolved_id)
        .join(F.broadcast(dim_lookup), "_mid", "left")
        .select(
            "name",
            F.col("_mid").alias("matched_id"),
            "matched_name",
            F.when(F.col("_alias_id").isNotNull(), F.lit(1.0))
            .when(F.col("_exact_id").isNotNull(), F.lit(1.0))
            .otherwise(F.col("_fscore"))
            .alias("score"),
            F.when(F.col("_alias_id").isNotNull(), F.lit("alias"))
            .when(F.col("_exact_id").isNotNull(), F.lit("exact"))
            .when(F.col("_fuzzy_id").isNotNull(), F.lit("fuzzy"))
            .otherwise(F.lit("none"))
            .alias("match_strategy"),
        )
    )


def repair_center(existing_center: Column, incoming_center: Column, unknown_id: int = 0):
    """Center upgrade rules (identity_resolution.py:84-105,139-173):
    unknown (0) upgrades to a real center; a real center never
    downgrades; two different real centers -> conflict flag.

    Returns (new_center Column, conflict Column).
    """
    both_real = (
        (existing_center != unknown_id)
        & (incoming_center != unknown_id)
        & (existing_center != incoming_center)
    )
    new_center = (
        F.when(existing_center == unknown_id, incoming_center)
        .otherwise(existing_center)
    )
    return new_center, both_real
