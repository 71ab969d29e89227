"""The applyInPandas grouped-map variant must agree with the relational stage 3."""

from reden_spark import datagen
from reden_spark.operators.candidates import conversation_cases, generate_candidates
from reden_spark.operators.disambiguate import NELConfig, disambiguate
from reden_spark.operators.grouped import disambiguate_grouped
from reden_spark.operators.mentions import detect_mentions

CFG = NELConfig(base_prefix=datagen.BASE_PREFIX, preferred_uri=datagen.BASE_PREFIX)


def test_grouped_matches_relational(spark, tables):
    mentions = detect_mentions(tables["transcripts"], tables["mention_terms"])
    candidates = generate_candidates(mentions, tables["dico"])
    cases = conversation_cases(mentions, candidates)
    args = (mentions, candidates, tables["kb_edges"], tables["rel_weights"], cases, CFG)

    def key(df):
        return {
            (r.conv_id, r.turn_idx, r.occ_idx, r.mention): (r.chosen_uris, r.score, r.path)
            for r in df.collect()
        }

    rel = key(disambiguate(*args))
    grp = key(disambiguate_grouped(*args))
    assert rel == grp
    assert len(rel) > 50
