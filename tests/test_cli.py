"""End-to-end CLI test: python -m sec_dl_spark on hermetic seed/idx inputs
(the reference's `python3 -m sec_dl.main` surface, run.sh:23)."""

import json
import os
import subprocess
import sys


def test_pipeline_cli_end_to_end(tmp_path):
    (tmp_path / "companies.csv").write_text(
        "permno,ticker,cik,business_name\n"
        "1,ALF,100,ALPHA CORP\n"
        '2,BET,200,"BETA, INC."\n'
    )
    (tmp_path / "filing_types.csv").write_text(
        "type_id,type,keep\n1,10-K,1\n2,10-Q,1\n3,8-K,0\n"
    )
    (tmp_path / "q1.idx").write_text(
        "preamble\n" * 8
        + "CIK|Company Name|Form Type|Date Filed|Filename\n"
        + "-" * 40 + "\n"
        + "100|ALPHA CORP|10-K|2023-01-15|edgar/data/100/a.txt\n"
        + "100|ALPHA CORP|8-K|2023-02-01|edgar/data/100/b.txt\n"
        + "200|BETA, INC.|10-Q|2023-03-10|edgar/data/200/c.txt\n"
        + "999|UNKNOWN|10-K|2023-03-25|edgar/data/999/d.txt\n"
    )
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "sec_dl_spark",
         "--base", str(tmp_path / "wh"),
         "--companies", str(tmp_path / "companies.csv"),
         "--filing-types", str(tmp_path / "filing_types.csv"),
         "--idx", str(tmp_path / "q1.idx"),
         "--debug"],
        capture_output=True, text=True, timeout=240, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # monitor line: 2 filings kept (8-K type dropped, unknown CIK dropped),
    # all scraped by the offline fetcher
    assert "'n_total': 2" in out.stdout and "'n_pending': 0" in out.stdout
    assert (tmp_path / "wh" / "filings_meta").exists()
    assert (tmp_path / "wh" / "filings_text_next").exists()
    # K11 debug sink: plain text files, one "<id>\t<text>" line per filing
    debug_lines = [
        line
        for f in (tmp_path / "wh" / "debug_text").glob("part-*.txt")
        for line in f.read_text().splitlines()
    ]
    assert len(debug_lines) == 2
    assert all("\t" in line and "annual report" in line for line in debug_lines)


def test_query_cli_runs_and_lists(tmp_path):
    env = dict(
        os.environ,
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, "-m", "sec_dl_spark", "query", "list"],
        capture_output=True, text=True, timeout=120, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "q1_pricing_summary\toracled" in out.stdout
    assert "emb_pq_topk\trows-only" in out.stdout

    out = subprocess.run(
        [sys.executable, "-m", "sec_dl_spark", "query", "agg_distinct",
         "--sf", "/root/testdata/sf0.001", "--limit", "5"],
        capture_output=True, text=True, timeout=240, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "== agg_distinct ==" in out.stdout

    out = subprocess.run(
        [sys.executable, "-m", "sec_dl_spark", "query", "no_such_query"],
        capture_output=True, text=True, timeout=120, env=env, cwd=str(tmp_path),
    )
    assert out.returncode != 0 and "unknown queries" in out.stderr
