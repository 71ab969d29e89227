"""Dictionary-build job (plans/dico_build.py) + TSV source/sink round-trip."""

from reden_spark.plans.dico_build import build_dico
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


def test_dico_tsv_roundtrip(spark, tables, tmp_path):
    dico = build_dico(tables["kb_persons"]).drop("letter")
    p = str(tmp_path / "dico_tsv")
    write_dico_tsv(dico, p)
    back = read_dico_tsv(spark, p, ne_type="PER")
    a = {(r.alias, r.name, tuple(r.uris)) for r in dico.collect()}
    b = {(r.alias, r.name, tuple(r.uris)) for r in back.collect()}
    assert a == b
