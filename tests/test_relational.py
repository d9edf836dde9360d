"""L1 — every REGISTRY query vs its DuckDB oracle at sf0.01
(the driver's correctness gate, replicated locally).

Scale-robustness: override the fixture directory to re-run the whole
replica at another sf, e.g.::

    SPARKGATHA_ORACLE_SF_DIR=/root/testdata/sf0.1 \
        python -m pytest tests/test_relational.py -q

(verified green for all 75 oracle-bearing entries at sf0.1 in round 3 —
no oracle is scale-dependent)."""

import os

import pytest

from oracle_harness import compare, duck_con

import __spark_entry__ as entrymod

SF_DIR = os.environ.get(
    "SPARKGATHA_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)

REGISTRY = entrymod._registry()
ORACLE_NAMES = [n for n, s in REGISTRY.items() if s.oracle is not None]


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_return_rows(spark):
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            assert spec.fn(spark, SF_DIR).limit(1).count() >= 0, name


def test_no_oracle_emits_hugeint(con):
    """Driver-hash false-negative guard (VERDICT r4 item 1): DuckDB
    promotes SUM(BIGINT) to HUGEINT (int128) while Spark emits BIGINT,
    so a type-aware value hash diverges on bit-identical values (the
    q_bpe_merges red row of CORRECTNESS_r04).  Type every registered
    oracle via a bind-only pass and reject HUGEINT/UHUGEINT/DECIMAL
    output columns — oracles must CAST such sums to BIGINT/DOUBLE."""
    banned = ("HUGEINT", "UHUGEINT", "DECIMAL")
    offenders = []
    for name in ORACLE_NAMES:
        rel = con.sql(REGISTRY[name].oracle)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if any(b in t for b in banned):
                offenders.append(f"{name}.{col}: {t}")
    assert not offenders, "; ".join(offenders)
