"""Registry contract guards: the driver's correctness gate checks a
positional window of the FIRST 50 registry entries, so evidence hygiene is
an ordering invariant — enforce it mechanically."""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _correctness_files() -> list:
    return sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))


def _latest_driver_rows() -> set:
    """Names with a driver correctness row in the most recent round."""
    files = _correctness_files()
    if not files:
        return set()
    return set(json.load(open(files[-1])))


def _latest_round() -> int:
    """Round number of the most recent driver correctness file (0 if none)."""
    files = _correctness_files()
    if not files:
        return 0
    return int(re.search(r"_r(\d+)\.json$", files[-1]).group(1))


def test_every_query_has_fn_and_distinct_name():
    from kafka_connect_storage_cloud_formats_spark.queries.registry import QUERIES

    assert len(QUERIES) >= 81
    for name, (fn, sql) in QUERIES.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name


def test_unevidenced_queries_lead_the_driver_window():
    """Any query without a driver row from the latest recorded round must
    sit inside the first 50 registry entries, or it can never earn one.

    This positional invariant is only satisfiable for the round the
    ordering was rotated FOR (registry.ROTATED_FOR_ROUND): the moment the
    driver records that round, the window has been consumed and queries
    outside it legitimately carry only older rows — so the assertion is
    scoped to rounds the current rotation still targets (the round-3
    verdict's time-dependency fix)."""
    import pytest

    from kafka_connect_storage_cloud_formats_spark.queries.registry import (
        QUERIES,
        ROTATED_FOR_ROUND,
    )

    latest = _latest_round()
    # Forcing function: the rotation may lag the driver by at most one
    # round (the round that consumed it). If CORRECTNESS_r{N+1} exists
    # while ROTATED_FOR_ROUND is still N, a new round started without
    # rotating the registry — the exact silent lapse this test exists to
    # catch. Bump ROTATED_FOR_ROUND (and reorder _PRIORITY) each round.
    assert latest <= ROTATED_FOR_ROUND, (
        f"registry rotation is stale: latest driver round is r{latest} but "
        f"ROTATED_FOR_ROUND={ROTATED_FOR_ROUND}; rotate _PRIORITY in "
        "queries/registry.py for the new round"
    )
    if latest == ROTATED_FOR_ROUND:
        pytest.skip(
            f"window consumed: driver already recorded r{latest} for this "
            "rotation; positional invariant legitimately lapsed (visible "
            "skip, not silent pass)"
        )
    evidenced = _latest_driver_rows()
    names = list(QUERIES)
    window = set(names[:50])
    outside = [n for n in names if n not in evidenced and n not in window]
    # Round 11: 100+ registered queries no longer fit a 2×50-window
    # ≤1-round-stale invariant. Overflow must be (a) EXPLICITLY declared
    # (registry._SLIPPED_TO_R12-style list — a silent slip is the lapse
    # this test exists to catch), (b) evidenced in the latest or previous
    # round's window — which, with the slipped query then waiting one
    # extra round, bounds its evidence gap at its r{N+1} debut to the
    # ceil(N/50)-round bound registry.py documents (round-11 ADVICE: the
    # earlier "≤2-rounds-stale" wording overstated what this enforces —
    # a query slipped from a previous-round window is 3 rounds stale at
    # debut), and (c) no larger than the window shortfall.
    from kafka_connect_storage_cloud_formats_spark.queries import registry as _reg

    declared = set(getattr(_reg, f"_SLIPPED_TO_R{ROTATED_FOR_ROUND + 1}", []))
    assert set(outside) == declared, (
        f"window overflow must exactly match the declared slip list: "
        f"outside={sorted(outside)} declared={sorted(declared)}; reorder "
        "_PRIORITY or fix the declaration in queries/registry.py"
    )
    # (c) the slip list is no larger than arithmetic requires: N queries
    # minus two windows' capacity. A larger declared list would silently
    # weaken the staleness bound the round protocol documents.
    assert len(declared) <= max(0, len(names) - 100), (
        f"{len(declared)} slipped queries declared but the window shortfall "
        f"is only {max(0, len(names) - 100)} (N={len(names)})"
    )
    recent_rows: set = set()
    for f in _correctness_files():
        if any(
            f.endswith(f"_r{r:02d}.json") or f.endswith(f"_r{r}.json")
            for r in (latest, latest - 1)
        ):
            recent_rows |= set(json.load(open(f)))
    for n in outside:
        assert n in recent_rows, (
            f"slipped query {n} lacks a r{latest}/r{latest - 1} row — "
            "slipping it would exceed the declared staleness bound"
        )


def test_no_query_lacks_driver_evidence_in_every_round():
    """Time-stable companion to the window check: every registered query
    must have a driver row in SOME recorded round, except queries new in
    the current rotation (which must sit inside the window to earn one)."""
    from kafka_connect_storage_cloud_formats_spark.queries.registry import QUERIES

    union_evidence: set = set()
    for f in _correctness_files():
        union_evidence |= set(json.load(open(f)))
    if not union_evidence:
        return
    names = list(QUERIES)
    window = set(names[:50])
    orphans = [n for n in names if n not in union_evidence and n not in window]
    assert not orphans, (
        f"queries with no driver row in any round AND outside the window: {orphans}"
    )


def test_every_query_is_oracle_gated():
    """No rows-only exceptions remain: round 6 made approx_profile emit
    exact columns + in-engine tolerance verdicts, so every registered
    query now carries a hash-comparable SQL oracle."""
    from kafka_connect_storage_cloud_formats_spark.queries.registry import QUERIES

    no_oracle = {n for n, (_, sql) in QUERIES.items() if sql is None}
    assert no_oracle == set(), no_oracle


def test_bench_payload_writer_partial_and_final(tmp_path, monkeypatch):
    """bench._write_payload must produce a parseable dual-series document
    from PARTIAL samples (mid-run snapshot after a completed pass — the
    killed-run insurance) and mark it with passes_done; queries not yet
    sampled are omitted rather than KeyError-ing."""
    import json

    import bench

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    samples = {"q1": [0.5, 0.4, 0.6], "q2": [0.2]}
    doc = bench._write_payload(samples, ["q1", "q2", "q3"], passes_done=1)
    on_disk = json.load(open(tmp_path / "BENCH.json"))
    assert on_disk == doc
    assert doc["passes_done"] == 1
    assert set(doc["queries"]) == {"q1", "q2"}  # q3 not yet sampled
    assert doc["queries"]["q1"] == 0.4  # min series
    assert doc["queries_trimmed_mean"]["q1"] == 0.45  # drop-worst at n=3
    assert doc["queries_trimmed_mean"]["q2"] == 0.2  # n<3 → plain mean
    # final write has no provisional marker
    final = bench._write_payload(samples, ["q1", "q2"])
    assert "passes_done" not in final


def test_prepared_plan_cache_identity_and_exclusions():
    """Read-only queries are served ONE immutable plan per (session,
    corpus) — same object identity on a hit; excluded queries (scratch-dir
    roundtrips, live-build entries) rebuild per call so each execution
    re-runs the work their rows certify/measure."""
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from kafka_connect_storage_cloud_formats_spark import get_spark
    from kafka_connect_storage_cloud_formats_spark.queries import registry

    spark = get_spark("tests")
    sf = "/root/testdata/sf0.001"
    q1 = registry.QUERIES["q1_pricing_summary"][0]
    assert q1(spark, sf) is q1(spark, sf)  # cache hit: identical plan object
    for name in ("ivf_index_build", "orc_ingest_roundtrip"):
        fn = registry.QUERIES[name][0]
        assert fn.__name__ == name  # not wrapped by _prepared
        assert name in registry._SIDE_EFFECT_QUERIES


def test_prepared_plan_cache_invalidates_on_corpus_regeneration(tmp_path):
    """A corpus REGENERATED at the same path must rebuild the prepared
    plan (fingerprint revalidation — same contract as the table cache),
    and the rebuilt plan must read the new data."""
    import os
    import shutil

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from kafka_connect_storage_cloud_formats_spark import get_spark
    from kafka_connect_storage_cloud_formats_spark.queries import registry

    spark = get_spark("tests")
    src = "/root/testdata/sf0.001"
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for t in ("orders",):
        shutil.copy(f"{src}/{t}.parquet", corpus / f"{t}.parquet")

    fn = registry.QUERIES["orders_rollup"][0]
    df1 = fn(spark, str(corpus))
    rows1 = df1.collect()
    assert fn(spark, str(corpus)) is df1  # stable corpus → cache hit

    # regenerate: halve the orders table at the same path
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}/orders.parquet') "
        f"WHERE o_orderkey % 2 = 0) TO '{corpus}/orders.parquet' (FORMAT PARQUET)"
    )
    df2 = fn(spark, str(corpus))
    assert df2 is not df1  # fingerprint moved → rebuilt plan
    assert df2.collect() != rows1  # and it reads the regenerated data


def test_prepared_plan_cache_serves_aligned_session_clones():
    """spark.newSession() clones share the applicationId and (by the same
    contract as catalog._TABLE_CACHE, which underlies every plan here)
    the prepared-plan cache. An ALIGNED clone (apply_session_confs) gets
    the shared plan and identical results; a conf-divergent clone (non-UTC
    timezone) bypasses the cache into the builders' own loud guards."""
    import os

    import pytest

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from kafka_connect_storage_cloud_formats_spark import get_spark
    from kafka_connect_storage_cloud_formats_spark.queries import registry
    from kafka_connect_storage_cloud_formats_spark.session import apply_session_confs

    spark = get_spark("tests")
    sf = "/root/testdata/sf0.001"
    fn = registry.QUERIES["q13_order_count_distribution"][0]
    df1 = fn(spark, sf)
    clone = apply_session_confs(spark.newSession())
    df2 = fn(clone, sf)
    assert df2 is df1  # aligned clone: shared plan, same contract as load_table
    assert sorted(map(tuple, df2.collect())) == sorted(map(tuple, df1.collect()))

    # divergent clone: the wrapper must NOT serve the cache; the events
    # builders raise loudly on a non-UTC session
    bad = spark.newSession()
    bad.conf.set("spark.sql.session.timeZone", "America/New_York")
    ev_fn = registry.QUERIES["events_latest_per_user"][0]
    with pytest.raises(Exception, match="UTC|timeZone|timezone"):
        ev_fn(bad, sf).collect()


def test_readme_query_count_matches_registry():
    """Docs-staleness guard (round 12: the registry count went 104 → 111
    in one round and stale copies of the number were caught three times
    in review): README's headline count must equal len(QUERIES)."""
    import os
    import re

    from kafka_connect_storage_cloud_formats_spark.queries.registry import QUERIES

    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")
    ).read()
    m = re.search(r"(\d+) registered queries", readme)
    assert m, "README must state the registered-query count"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} registered queries but the registry has "
        f"{len(QUERIES)} — update the README (and SURVEY §2.4 if stale)"
    )
