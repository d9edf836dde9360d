"""Driver-contract smoke: entry() runs and returns ranked terms."""

import __spark_entry__ as entrymod


def test_entry_returns_ranked_terms(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    assert set(df.columns) == {"key", "rank"}
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r["rank"] > 0 for r in rows)


def test_registry_contract():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 40
    assert set(o) <= set(q)
