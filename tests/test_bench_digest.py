"""The bench's SKIP-TAINTED stdout digest is the only surviving output of
an ordering experiment (a non-empty SPARK_GRAFT_BENCH_SKIP refuses to
write BENCH_LAST.json / the archive — ADVICE r15), and the driver's
bounded stdout tail clips oversized lines HEAD-first (the BENCH_r07-r09
"parsed": null failure). These tests pin the digest contract as executable
evidence instead of a comment."""

import json

from bench import build_skip_digest


def _timings(n):
    return {f"q{i:03d}_some_query_name": 0.5 + i * 0.01 for i in range(n)}


def test_skip_digest_small_list_verbatim():
    line = build_skip_digest(_timings(140), ["emb_hamming_topk"], 0.1, 180.0)
    d = json.loads(line)
    assert d["skip_names"] == ["emb_hamming_topk"]
    assert d["n_queries"] == 140
    assert len(d["queries"]) == 3  # slowest-3 convention, like the main digest
    assert max(d["queries"].values()) == max(_timings(140).values())
    assert "SKIP-TAINTED" in d["metric"]
    assert len(line) < 1500


def test_skip_digest_long_list_summarized_under_window():
    # ~60 realistic-length names would blow the 1.5 KB window verbatim;
    # the digest must summarize to count + hash + head and stay under it
    skips = [f"corpus_some_longer_query_name_{i:02d}" for i in range(60)]
    line = build_skip_digest(_timings(90), skips, 0.1, 120.0)
    assert len(line) < 1500
    d = json.loads(line)
    sn = d["skip_names"]
    assert sn["n"] == 60
    assert sn["head"] == skips[:5]
    assert len(sn["sha256_12"]) == 12
    # the hash pins WHICH skip set ran, order-sensitively
    other = build_skip_digest(_timings(90), list(reversed(skips)), 0.1, 120.0)
    assert json.loads(other)["skip_names"]["sha256_12"] != sn["sha256_12"]


def test_skip_digest_missing_ab_queries_cannot_keyerror():
    # a skip set dropping either hamming A/B leg must not break digest
    # construction (the ratio guard lives in main; the digest itself only
    # reads timings) — empty timings is the degenerate floor
    line = build_skip_digest({}, ["emb_hamming_topk", "emb_cosine_topk"], 0.01, 0.0)
    d = json.loads(line)
    assert d["n_queries"] == 0 and d["queries"] == {}
