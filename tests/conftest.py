import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from reden_spark import datagen  # noqa: E402
from reden_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("reden-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("fixtures") / "small"
    datagen.generate(out, n_convs=24, mean_turns=10, skew_factor=5)
    return out


@pytest.fixture(scope="session")
def tables(spark, fixture_dir):
    def load(name):
        return spark.read.parquet(str(fixture_dir / f"{name}.parquet"))

    return {
        name: load(name)
        for name in [
            "transcripts",
            "dico",
            "mention_terms",
            "kb_edges",
            "rel_weights",
            "gold_links",
            "kb_persons",
        ]
    }


@pytest.fixture(scope="session")
def py_tables(fixture_dir):
    import pyarrow.parquet as pq

    def load(name):
        return pq.read_table(str(fixture_dir / f"{name}.parquet")).to_pylist()

    return {
        name: load(name)
        for name in [
            "transcripts",
            "dico",
            "mention_terms",
            "kb_edges",
            "rel_weights",
            "gold_links",
        ]
    }


@pytest.fixture(scope="session")
def oracle_links(py_tables):
    from reden_spark import oracle

    return oracle.run_oracle(
        py_tables["transcripts"],
        py_tables["dico"],
        [r["term"] for r in py_tables["mention_terms"]],
        [(r["subj"], r["pred"], r["obj"]) for r in py_tables["kb_edges"]],
        [(r["pred"], r["weight"]) for r in py_tables["rel_weights"]],
        datagen.BASE_PREFIX,
        datagen.BASE_PREFIX,
    )
