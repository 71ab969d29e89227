"""Explicit StructTypes for every table in the pipeline (SURVEY.md §1).

The reference's schema system is implicit (hard-coded POJOs + positional TSV,
DicoProcessingNEL.java:88-97); here every table is an explicit StructType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The authoritative input shape (BASELINE.json input_hint).
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# Candidate dictionary (reference TSV row: alias \t normalizedName \t uri1 uri2...,
# QueryPlaceDBpedia.java:200-205; normalization key DicoProcessingNEL.java:410-415).
DICO = StructType(
    [
        StructField("alias", StringType(), False),
        StructField("alias_norm", StringType(), False),
        StructField("name", StringType(), True),
        StructField("ne_type", StringType(), True),
        StructField("uris", ArrayType(StringType()), False),
    ]
)

# All annotatable surface forms (dico aliases + NIL-able terms). Models the
# reference's TEI `persName`/`placeName` tags, which may carry mentions absent
# from the dictionary (the NIL cases, ResultsAndEvaluationNEL.java:473-508).
MENTION_TERMS = StructType(
    [
        StructField("term", StringType(), False),
        StructField("ne_type", StringType(), True),
    ]
)

# Fused RDF KB (replaces per-URI N3 files, GraphHandlerNEL.java:78-103).
KB_EDGES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("weight", DoubleType(), True),
    ]
)

# rels.txt ("predicate weight" lines, GraphHandlerNEL.java:237-249).
REL_WEIGHTS = StructType(
    [
        StructField("pred", StringType(), False),
        StructField("weight", DoubleType(), False),
    ]
)

# Stage 1 output: one row per detected mention occurrence.
MENTIONS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("occ_idx", IntegerType(), False),
        StructField("mention", StringType(), False),
        StructField("start_pos", IntegerType(), False),
        StructField("ne_type", StringType(), True),
    ]
)

# Stage 2 output: one row per (conversation, mention surface form, candidate group).
CANDIDATES = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("mention", StringType(), False),
        StructField("group_idx", IntegerType(), False),
        StructField("uris", ArrayType(StringType()), False),
    ]
)

# Stage 3 output: chosen URI(s) per mention occurrence.
LINKS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("occ_idx", IntegerType(), False),
        StructField("mention", StringType(), False),
        StructField("chosen_uris", StringType(), True),
        StructField("score", DoubleType(), True),
        StructField("path", StringType(), True),  # 'graph' | 'simple'
    ]
)

# Stage 4 output.
TRIPLES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
    ]
)

# Gold standard (replaces *-gold.xml ref attributes, MainNELApp.java:152-156).
GOLD_LINKS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("occ_idx", IntegerType(), False),
        StructField("mention", StringType(), False),
        StructField("gold_uri", StringType(), True),  # null => NIL annotation
    ]
)

# Raw person-entity table consumed by the dictionary-build job (plans/dico_build.py)
# — offline stand-in for the reference's SPARQL extraction (QueryAuthorBNF.java).
KB_PERSONS = StructType(
    [
        StructField("uri", StringType(), False),
        StructField("first_name", StringType(), True),
        StructField("last_name", StringType(), True),
        StructField("gender", StringType(), True),
        StructField("birth_date", StringType(), True),  # raw date string, yyyy[-MM-dd]
        StructField("death_date", StringType(), True),
        StructField("ref", StringType(), True),  # sameAs reference
        StructField("rejected_form", StringType(), True),  # alt label
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)
