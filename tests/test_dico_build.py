"""Dictionary-build job (plans/dico_build.py) + TSV source/sink round-trip."""

from reden_spark.plans.dico_build import build_bne_dico, build_dico
from reden_spark.sources.dico_tsv import read_dico_tsv, write_dico_tsv


def test_build_dico_rules(spark, tables):
    dico = build_dico(tables["kb_persons"])
    rows = dico.collect()
    assert len(rows) > 100
    by_alias = {}
    for r in rows:
        by_alias.setdefault(r.alias, []).append(r)
    # alias generation rules present
    assert "Victor Hugo" in by_alias and "M. Hugo" in by_alias
    hugo = by_alias["Victor Hugo"][0]
    assert hugo.name.startswith("Hugo, Victor (")
    assert hugo.uris[0] == "http://kb.test/base/per/hugo"
    # sameAs refs merged into the URI group (QueryAuthorBNF.processResults)
    assert "http://ext.kb/hugo" in hugo.uris
    # rejected forms become aliases
    assert "Hugo, Victor" in by_alias
    # letter sharding incl. 'other'
    letters = {r.letter for r in rows}
    assert "h" in letters and letters <= set("abcdefghijklmnopqrstuvwxyz") | {"other"}


def test_build_dico_date_domain_filter(spark, tables):
    # birth-date domain filter (QueryAuthorBNF.java:69-85)
    dico = build_dico(tables["kb_persons"], greater_than=1840, lesser_than=1860)
    names = {r.alias for r in dico.collect()}
    assert "Arthur Rimbaud" in names  # born 1854
    assert "Victor Hugo" not in names  # born 1802


def test_build_bne_dico_rules(spark):
    """BNE-source semantics (QueryAuthorBNE.java:60-243, AuthorBNE.java:35-71):
    rejected-forms-only aliases, has-work gate, '(' truncation, hyphen and
    apostrophe display-name normalization, whole-form letter shard."""
    rows = [
        # merged across two result rows; paren suffix truncated; hyphen in name
        ("http://kb.test/bne/a1", "Garcia-Lorca", "Federico (poeta)", "http://ext.kb/a1", 3),
        ("http://kb.test/bne/a1", "Garcia-Lorca", "F. Garcia", None, 3),
        # apostrophe display-name normalization; 'other' letter bucket
        ("http://kb.test/bne/a2", "3D'Annunzio", "Gabriele", None, 1),
        # no rejected forms at all -> NO dico rows (writeAuthorToFile :238-241)
        ("http://kb.test/bne/a3", "Cervantes", None, "http://ext.kb/a3", 2),
        # has-work gate drops n_works = 0
        ("http://kb.test/bne/a4", "Quevedo", "Francisco", None, 0),
    ]
    authors = spark.createDataFrame(
        rows, "uri string, accepted_form string, rejected_form string, ref string, n_works int"
    )
    d = {r.alias: r for r in build_bne_dico(authors).collect()}
    assert set(d) == {"Federico", "F. Garcia", "Gabriele"}
    a1 = d["Federico"]
    assert a1.name == "Garcia Lorca" and a1.letter == "g"
    assert list(a1.uris) == ["http://kb.test/bne/a1", "http://ext.kb/a1"]
    a2 = d["Gabriele"]
    assert a2.name == "3D' Annunzio" and a2.letter == "other"


def test_dico_tsv_roundtrip(spark, tables, tmp_path):
    dico = build_dico(tables["kb_persons"]).drop("letter")
    p = str(tmp_path / "dico_tsv")
    write_dico_tsv(dico, p)
    back = read_dico_tsv(spark, p, ne_type="PER")
    a = {(r.alias, r.name, tuple(r.uris)) for r in dico.collect()}
    b = {(r.alias, r.name, tuple(r.uris)) for r in back.collect()}
    assert a == b
