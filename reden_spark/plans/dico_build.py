"""Dictionary-build job — the Spark restatement of the reference's Linked-Data
crawl mode (`-createDico`, AppAdhoc.crawlsLinkedData, AppAdhoc.java:49-292).

The remote SPARQL extraction becomes a batch job over an offline person-entity
table; the reference's hand-rolled tactics map to built-ins (SURVEY.md §4):

  * a-z + 'other' letter sharding (AppAdhoc.java:70-74)  -> a `letter` partition
    column (partition pruning replaces skip-if-shard-file-exists memoization);
  * birth/death date domain filter (QueryAuthorBNF.java:69-85, loadDomainParams
    AppAdhoc.java:301-324)                               -> pushed-down range filter;
  * per-author row merge of sameAs refs + rejected forms
    (QueryAuthorBNF.processResults :161-240)             -> groupBy(uri).agg(collect_set);
  * ~15 alias surface forms per author (AuthorBNF.makeAliases :138-192)
                                                          -> vectorized pandas UDF + explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.aliases import aliases_udf
from ..functions.text import normalize_mention, year_from_date


def build_dico(
    persons: DataFrame,
    greater_than: int | None = None,
    lesser_than: int | None = None,
    letters: list[str] | None = None,
    ne_type: str = "PER",
) -> DataFrame:
    """kb_persons -> DICO frame (+ `letter` shard column for partitioned writes)."""
    p = persons.withColumn("birth_year", year_from_date("birth_date"))
    if greater_than is not None:
        p = p.filter(F.col("birth_year") > greater_than)
    if lesser_than is not None:
        p = p.filter(F.col("birth_year") < lesser_than)

    letter = F.lower(F.substring(F.col("last_name"), 1, 1))
    p = p.withColumn("letter", F.when(letter.rlike("^[a-z]$"), letter).otherwise(F.lit("other")))
    if letters is not None:
        p = p.filter(F.col("letter").isin(letters))

    merged = p.groupBy("uri").agg(
        F.first("first_name", ignorenulls=True).alias("first_name"),
        F.first("last_name", ignorenulls=True).alias("last_name"),
        F.first("gender", ignorenulls=True).alias("gender"),
        F.first("birth_date", ignorenulls=True).alias("birth_date"),
        F.first("death_date", ignorenulls=True).alias("death_date"),
        F.first("letter", ignorenulls=True).alias("letter"),
        F.array_sort(F.collect_set("ref")).alias("refs"),
        F.array_sort(F.collect_set("rejected_form")).alias("rejected_forms"),
    )

    # display name "Last, First (birth-death)" (AuthorBNF.getNormalisedName :93-105)
    name = F.when(
        F.col("first_name").isNull() | F.col("first_name").isin("-", ""),
        F.col("last_name"),
    ).otherwise(F.concat_ws(", ", "last_name", "first_name"))
    name = F.regexp_replace(name, "'", "' ")
    name = F.when(
        F.col("birth_date").isNotNull() & F.col("death_date").isNotNull(),
        F.concat(name, F.lit(" ("), "birth_date", F.lit("-"), "death_date", F.lit(")")),
    ).otherwise(name)
    name = F.regexp_replace(name, "  ", " ")

    with_aliases = merged.withColumn(
        "all_aliases",
        F.array_union(
            aliases_udf("first_name", "last_name", "gender"),
            F.col("rejected_forms"),
        ),
    ).withColumn("uris", F.concat(F.array("uri"), "refs"))

    return (
        with_aliases.select(
            F.explode("all_aliases").alias("alias"),
            name.alias("name"),
            F.lit(ne_type).alias("ne_type"),
            "uris",
            "letter",
        )
        .filter(F.col("alias") != "")
        .withColumn("alias_norm", normalize_mention("alias"))
        .select("alias", "alias_norm", "name", "ne_type", "uris", "letter")
    )


def geonames_to_dico(raw: DataFrame) -> DataFrame:
    """Geonames dump -> dictionary rows: one row per primary + alternate name
    (scripts/genGeonamesDico.py:21-39 — Python-2 tab-split script restated as
    select + explode(split(alternatenames, ','))). Expects columns
    (geonameid, name, alternatenames)."""
    uri = F.concat(F.lit("http://sws.geonames.org/"), F.col("geonameid").cast("string"), F.lit("/"))
    base = raw.select(uri.alias("uri"), "name", "alternatenames")
    names = base.select("uri", F.col("name").alias("alias")).unionByName(
        base.select("uri", F.explode(F.split(F.coalesce("alternatenames", F.lit("")), ",")).alias("alias")).filter(
            F.col("alias") != ""
        )
    )
    return names.select(
        "alias",
        normalize_mention("alias").alias("alias_norm"),
        F.col("alias").alias("name"),
        F.lit("LOC").alias("ne_type"),
        F.array("uri").alias("uris"),
    ).distinct()


def write_dico(dico: DataFrame, path: str) -> None:
    """Letter-sharded dictionary table (partition pruning = the reference's
    alphabet shards)."""
    dico.write.mode("overwrite").partitionBy("letter").parquet(path)
