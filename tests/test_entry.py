"""Driver-contract smoke tests + a representative oracle-parity subset
(the full sweep is tools/compare_oracle.py / the driver's t2 gate)."""

import duckdb
import pytest

import __spark_entry__ as ent
from tools.compare_oracle import compare_frames, duck_connection

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "count_order" in df.columns


def test_registry_consistency():
    q = ent.queries()
    o = ent.oracle_sql()
    assert len(q) >= 45
    assert set(o) <= set(q)
    # the vast majority must be oracle-checked, not rows-only
    assert len(o) >= 0.75 * len(q)


REPRESENTATIVE = [
    "q1_pricing_summary",
    "join_star_3way",
    "join_q3_topk",
    "window_running_sum",
    "agg_rollup",
    "text_token_stats",
    "fts_search_and",
    "emb_cosine_topk",
    "events_sessionize",
    "events_asof_join",
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_oracle_parity_subset(spark, name):
    q = ent.queries()
    o = ent.oracle_sql()
    sdf = q[name](spark, SF).toPandas()
    con = duck_connection(SF)
    odf = con.sql(o[name]).df()
    errs = compare_frames(sdf, odf)
    assert not errs, f"{name}: {errs}"


def test_fixture_tables_load_with_expected_shape(spark):
    """Every declared fixture table loads, is non-empty, has unique column
    names, and events.ts arrives as a true (µs) timestamp — the nanos
    conversion contract in sources/fixtures.py."""
    from sec_dl_spark import schemas
    from sec_dl_spark.sources.fixtures import load_table

    for name in schemas.FIXTURE_TABLES:
        df = load_table(spark, "/root/testdata/sf0.001", name)
        cols = df.columns
        assert len(cols) == len(set(cols)) and df.limit(1).count() == 1, name
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_rotation_tool_evidence_parsing(tmp_path):
    """tools/rotation.py derives (latest evidence round, red set) from the
    CORRECTNESS artifacts: a rows-only row (err='no_oracle', spark_rows
    populated) is CLEAN; a real error, a missing spark_rows, or any
    False check is red; red reflects only the newest artifact."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import importlib

    rotation = importlib.import_module("rotation")

    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 5, "oracle_rows": 5, "err": None}
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 7, "oracle_rows": None, "err": "no_oracle"}
    hash_red = dict(ok, hash_match=False)
    err_red = dict(ok, err="spark error: boom")
    empty_red = dict(rows_only, spark_rows=None)

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": ok, "b": ok, "later_fixed": hash_red})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"b": ok, "c": rows_only, "d": hash_red,
                    "e": err_red, "f": empty_red, "later_fixed": ok})
    )
    latest, red = rotation.evidence(str(tmp_path))
    assert latest == {"a": 1, "b": 2, "c": 2, "d": 2, "e": 2, "f": 2,
                      "later_fixed": 2}
    # clean rows-only is NOT red; r1's red row was re-proven green in r2
    assert red == {"d", "e", "f"}


def test_rotation_build_slice_policy_and_defer_newest(tmp_path):
    """build_slice pins the standing policy on the LIVE artifacts: the
    slice is exactly 50 names led by --lead, every red/lead name always
    fits, and when red+lead+never-checked exceed the window the plain
    call REFUSES (SystemExit) while --defer-newest drops only the
    newest never-checked registrations and keeps everything else."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import importlib

    rotation = importlib.import_module("rotation")

    import pytest as _pt

    latest, red = rotation.evidence("/root/repo")
    # state-aware (the live never-checked count moves every round as
    # queries land and CORRECTNESS artifacts arrive): when red + lead +
    # never-checked overflow the window the strict form must REFUSE,
    # otherwise it must succeed and defer nothing
    from sec_dl_spark.plans.catalog import load_all

    never_live = [n for n in load_all() if n not in latest]
    overflow = len(set(red) | {"dedup_clusters"} | set(never_live)) > 50
    if overflow:
        with _pt.raises(SystemExit):
            rotation.build_slice("/root/repo", ["dedup_clusters"])
    else:
        strict_out, _ = rotation.build_slice("/root/repo", ["dedup_clusters"])
        assert len(strict_out) == 50

    out, info = rotation.build_slice(
        "/root/repo", ["dedup_clusters"], defer_newest=True
    )
    assert len(out) == 50 and out[0] == "dedup_clusters"
    assert len(set(out)) == 50
    # every red name (if any) made the slice
    assert set(info["red"]).issubset(set(out))
    # deferred = never-checked minus the slice, and they are the NEWEST
    # registrations (registration order == never-block order); with no
    # overflow the deferred list is empty and the slice-head equality
    # below still holds
    never = info["never_checked"]
    deferred = [n for n in never if n not in out]
    assert deferred == never[len(never) - len(deferred):]
    assert bool(deferred) == overflow
    # unknown --lead names are refused
    with _pt.raises(SystemExit):
        rotation.build_slice("/root/repo", ["not_a_query"])
