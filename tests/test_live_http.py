"""Live EDGAR integration — OPT-IN ONLY (this container has no network).

Run with SPARK_GRAFT_LIVE_HTTP=1 on a networked machine to exercise the
real fetch path (etl/scrape.py:http_fetcher) against the reference's own
debug filing (scrape_all_filings.py:150-155). Skips cleanly otherwise.
"""

import os

import pytest

LIVE = os.environ.get("SPARK_GRAFT_LIVE_HTTP") == "1"

# The filing the reference's debug mode fetches (scrape_all_filings.py:152).
DEBUG_FILING_PATH = "edgar/data/826773/0001104659-13-062460.txt"

pytestmark = pytest.mark.skipif(
    not LIVE, reason="live EDGAR HTTP test; set SPARK_GRAFT_LIVE_HTTP=1 to run"
)


def test_http_fetcher_known_filing():
    pytest.importorskip("requests")
    from sec_dl_spark.etl.scrape import http_fetcher

    raw = http_fetcher(DEBUG_FILING_PATH)
    assert raw is not None and len(raw) > 10_000
    assert raw == raw.lower()  # fetcher lowercases, like the reference :157
    assert "<sec-document>" in raw or "<document>" in raw


def test_live_fetch_parse_end_to_end(spark):
    pytest.importorskip("requests")
    from sec_dl_spark.etl.scrape import http_fetcher, parse_fetched, fetch_pending

    pending = spark.createDataFrame(
        [(1, DEBUG_FILING_PATH)], "filing_id long, path string"
    )
    fetched = fetch_pending(pending, fetcher=http_fetcher)
    parsed = parse_fetched(fetched.where("raw IS NOT NULL")).collect()
    assert len(parsed) == 1
    text = parsed[0]["text"]
    # cleaned: lowercase, no tags, no >=20-char base64 debris
    assert len(text) > 1_000
    assert "<" not in text and ">" not in text
    assert all(len(w) < 20 for w in text.split(" "))
