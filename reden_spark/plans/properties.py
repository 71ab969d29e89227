"""config.properties loader — CLI parity with the reference's 16-key driver file.

The reference is driven entirely by a Java properties file
(MainNELApp.java:105-123 reads keys 1-16; semantics documented inline in
config/config-authors-bnf.properties). This module ingests that exact file
shape and maps the surviving knobs onto :class:`NELConfig` + pipeline/dico
options, reporting every key that has no equivalent in the rebuild (dropped
knobs are *decisions*, not silent losses).

Key mapping (reference key -> rebuild):
  baseURIs            -> NELConfig.base_prefix           (first value)
  preferedURIOrder    -> NELConfig.preferred_uri
  centralityMeasure   -> NELConfig.centrality
  crawlSameAs         -> NELConfig.crawl_sameas
  sameAsproperty      -> NELConfig.sameas_pred
  namedEntityTag      -> extras['named_entity_tag']      (the gazetteer scan
                         replaces XPath tag selection; recorded for lineage)
  NERclassName        -> extras['ner_class']
  greaterThan/lesserThan -> extras['birth_after'/'death_before'] year ints
                         (dico-build domain filter, AppAdhoc.loadDomainParams
                         AppAdhoc.java:301-324; masks dd/MM/yyyy or -1)
  outDictionnaireDir  -> extras['dico_out_dir']
  addScores           -> extras['add_scores'] bool (annotate.py score suffix)
  propertyTagRef      -> extras['ref_attr'] (annotated-sink attribute name)
  xpathExpresion      -> extras['context_xpath'] (context unit = conversation
                         in the rebuild; recorded for lineage)

Dropped (no disk cache / Lucene / live network in the rebuild):
  useDicoIndex, indexDir, nameMainFolderDico, rdfData, KBsLocalNoNetwork,
  useGlobalCentrality (deprecated in the reference itself), spatialExtent
  (reference SpatialExtent.java is an empty stub).
"""

from __future__ import annotations

import re
from pathlib import Path

DROPPED_KEYS = {
    "useDicoIndex": "no Lucene index: the dictionary probe is a broadcast hash join",
    "indexDir": "no Lucene index directory",
    "nameMainFolderDico": "dictionaries are DataFrames/tables, not TSV shard folders",
    "rdfData": "no per-URI N3 disk cache: kb_edges is a pre-materialized table",
    "KBsLocalNoNetwork": "the rebuild never touches the network",
    "useGlobalCentrality": "deprecated in the reference (config comment, key 8)",
    "spatialExtent": "SpatialExtent.java is an empty stub in the reference",
}


def load_properties(path: str | Path) -> dict[str, str]:
    """Parse a Java .properties file: '#'/'!' comments, key=value or
    key: value, backslash line continuations, whitespace-trimmed keys/values.
    (The subset java.util.Properties features the reference's configs use.)"""
    props: dict[str, str] = {}
    pending = ""
    for raw in Path(path).read_text(encoding="utf-8", errors="replace").splitlines():
        line = pending + raw.strip()
        pending = ""
        if not line or line.lstrip().startswith(("#", "!")):
            continue
        if line.endswith("\\") and not line.endswith("\\\\"):
            pending = line[:-1]
            continue
        m = re.match(r"^([^=:]+?)\s*[=:]\s*(.*)$", line)
        if m:
            props[m.group(1).strip()] = m.group(2).strip()
    return props


def _year_of(mask: str | None) -> int | None:
    """dd/MM/yyyy | yyyy | -1/empty -> year int or None
    (AppAdhoc.loadDomainParams date handling)."""
    if not mask or mask.strip() in ("-1", ""):
        return None
    m = re.search(r"(\d{4})\s*$", mask.strip())
    return int(m.group(1)) if m else None


def nel_config_from_properties(path: str | Path):
    """-> (NELConfig, extras: dict, dropped: dict[key, reason]).

    `dropped` lists every key present in the file with no rebuild equivalent,
    each with the documented reason — callers (pipeline CLI) log them."""
    from ..operators.disambiguate import NELConfig

    props = load_properties(path)
    base = (props.get("baseURIs") or "").split(",")[0].strip()
    if not base:
        raise ValueError(f"{path}: baseURIs is required (key 3 of the reference config)")
    cfg = NELConfig(
        base_prefix=base,
        preferred_uri=(props.get("preferedURIOrder") or "ALL").strip(),
        centrality=(props.get("centralityMeasure") or "DegreeCentrality").strip(),
        crawl_sameas=(props.get("crawlSameAs") or "ALL").strip(),
        sameas_pred=(props.get("sameAsproperty") or "http://www.w3.org/2002/07/owl#sameAs").strip(),
    )
    extras = {
        "named_entity_tag": props.get("namedEntityTag"),
        "ner_class": props.get("NERclassName"),
        "ref_attr": props.get("propertyTagRef", "ref_auto"),
        "add_scores": (props.get("addScores", "false").lower() == "true"),
        "context_xpath": props.get("xpathExpresion"),
        "dico_out_dir": props.get("outDictionnaireDir"),
        "birth_after": _year_of(props.get("greaterThan")),
        "death_before": _year_of(props.get("lesserThan")),
    }
    dropped = {k: DROPPED_KEYS[k] for k in props if k in DROPPED_KEYS}
    return cfg, extras, dropped
