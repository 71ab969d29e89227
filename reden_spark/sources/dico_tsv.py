"""Dictionary TSV source/sink in the reference's shard format.

Row format: `alias \t normalizedName \t uri1 \t uri2 ...` (variable arity) —
doc comment at QueryPlaceDBpedia.java:200-205, writer QueryAuthorBNF.java:254-266,
reader DicoProcessingNEL.java:88-97 (col 0 = alias, col 1 = display name skipped,
cols 2+ = URI group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalize_mention


def write_dico_tsv(dico: DataFrame, path: str) -> None:
    """DICO frame -> reference-format TSV shard(s).

    The format has no null escape and concat_ws silently SKIPS nulls — a null
    name would shift every URI one column left on read-back — so alias/name are
    pinned to '' explicitly (read_dico_tsv restores '' name to null)."""
    lines = dico.select(
        F.concat_ws(
            "\t",
            F.coalesce(F.col("alias"), F.lit("")),
            F.coalesce(F.col("name"), F.lit("")),
            F.concat_ws("\t", F.col("uris")),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)


def read_dico_tsv(spark: SparkSession, path: str, ne_type: str | None = None) -> DataFrame:
    """Reference-format TSV -> DICO frame (alias_norm recomputed like
    DicoProcessingNEL.replaceNonAlphabeticCharacters)."""
    raw = spark.read.text(path)
    parts = raw.select(F.split("value", "\t").alias("p"))
    return parts.select(
        F.col("p")[0].alias("alias"),
        normalize_mention(F.col("p")[0]).alias("alias_norm"),
        F.nullif(F.col("p")[1], F.lit("")).alias("name"),
        F.lit(ne_type).alias("ne_type"),
        # split() keeps trailing empties: a row written with uris=[] yields a
        # phantom [''] slice — filter empty tokens BEFORE the size gate
        F.filter(
            F.slice("p", 3, F.greatest(F.size("p") - 2, F.lit(0))), lambda u: u != ""
        ).alias("uris"),
    ).filter(F.size("uris") > 0)
