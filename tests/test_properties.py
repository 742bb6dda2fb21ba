"""Property-based differential tests: random small inputs, Spark operator
vs a brute-force Python reference. Catches edge semantics the fixture
corpus never produces (empty docs, all-duplicate corpora, single-token
texts, adversarial gaps)."""

import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

# one shared max-examples budget: each example spins Spark jobs
EX = settings(max_examples=15, deadline=None)

words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)


def brute_jaccard(a: str, b: str, n: int = 3) -> float | None:
    def sh(t):
        toks = [w for w in t.split() if w]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    inter = len(sa & sb)
    if inter == 0:
        return None  # operator contract: zero-overlap pairs are not emitted
    return inter / len(sa | sb)


@EX
@given(st.lists(texts, min_size=2, max_size=6))
def test_jaccard_pairs_matches_bruteforce(spark, docs):
    from sec_dl_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, block_col=None).collect()
    }
    expected = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            jac = brute_jaccard(docs[i], docs[j])
            if jac is not None:
                expected[(i, j)] = jac
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert math.isclose(got[k], v, rel_tol=1e-9)


@EX
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 5000)), min_size=1, max_size=20
    )
)
def test_sessionize_matches_bruteforce(spark, rows):
    import datetime as dt

    from sec_dl_spark.operators.relational import sessionize

    base = dt.datetime(2024, 1, 1)
    data = [
        (i, u, base + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, user_id long, ts timestamp")
    out = sessionize(df, key="user_id", ts_col="ts", gap_seconds=600, order_cols=["event_id"])
    got = {(r["event_id"]): (r["user_id"], r["session_id"]) for r in out.collect()}

    # brute force: per user, sort by (ts, event_id), new session when gap > 600s
    expected = {}
    by_user: dict = {}
    for i, u, ts in data:
        by_user.setdefault(u, []).append((ts, i))
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for ts, i in evs:
            if prev is not None and (ts - prev).total_seconds() > 600:
                sid += 1
            expected[i] = (u, sid)
            prev = ts
    # session ids may be 0- or 1-based; the induced (user, session) grouping
    # of events is what must match
    assert _same_partitioning(got, expected)


def _same_partitioning(got, expected):
    """Session ids may be 0- or 1-based; only the induced grouping matters."""
    def groups(m):
        g: dict = {}
        for ev, (u, s) in m.items():
            g.setdefault((u, s), set()).add(ev)
        return sorted(tuple(sorted(v)) for v in g.values())

    return groups(got) == groups(expected)


@EX
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 5)),
        min_size=0,
        max_size=25,
    )
)
def test_salted_distinct_matches_exact(spark, rows):
    from sec_dl_spark.operators.skew import salted_distinct_count

    if not rows:
        return
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: r["n_distinct_v"]
        for r in salted_distinct_count(df, ["g"], "v", n_salts=3).collect()
    }
    expected: dict = {}
    for g, v in rows:
        expected.setdefault(g, set()).add(v)
    assert got == {g: len(vs) for g, vs in expected.items()}


@EX
@given(st.recursive(
    st.sampled_from(["x", "y", "z", "w"]).map(lambda t: ("term", t)),
    lambda leaf: st.one_of(
        leaf.map(lambda x: ("not", x)),
        st.tuples(leaf, leaf).map(lambda ab: ("and", list(ab))),
        st.tuples(leaf, leaf).map(lambda ab: ("or", list(ab))),
    ),
    max_leaves=6,
))
def test_tsquery_roundtrip_and_eval(spark, ast):
    """Render a random AST to a query string, reparse it, and check the
    evaluation matches a brute-force per-doc predicate."""
    from sec_dl_spark.operators.fts import build_inverted_index, parse_tsquery, search_query

    def render(node):
        k = node[0]
        if k == "term":
            return node[1]
        if k == "not":
            return "!(" + render(node[1]) + ")"
        op = " & " if k == "and" else " | "
        return "(" + op.join(render(p) for p in node[1]) + ")"

    q = render(ast)
    assert parse_tsquery(q) is not None  # parses cleanly

    corpus = {1: "x y", 2: "x z", 3: "y z w", 4: "q"}
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {r["doc_id"] for r in search_query(build_inverted_index(docs), q).collect()}

    def holds(node, toks):
        k = node[0]
        if k == "term":
            return node[1] in toks
        if k == "not":
            return not holds(node[1], toks)
        if k == "and":
            return all(holds(p, toks) for p in node[1])
        return any(holds(p, toks) for p in node[1])

    expected = {d for d, text in corpus.items() if holds(ast, set(text.split()))}
    assert got == expected


@EX
@given(st.lists(st.text(alphabet="abc01", min_size=1, max_size=8), min_size=1, max_size=10))
def test_bpe_roundtrip_property(spark, corpus_words):
    """Any corpus of [a-z0-9] words round-trips through corpus-trained BPE:
    concatenating a word's subword tokens (marker stripped) reproduces the
    word, for seen AND unseen inputs."""
    from sec_dl_spark.functions.bpe import EOW, _segment_word, bpe_train

    text = " ".join(corpus_words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = bpe_train(df, n_merges=20)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for w in corpus_words + ["zz9zz"]:
        seg = _segment_word(w, ranks)
        assert "".join(seg).replace(EOW, "") == w
        assert all(t for t in seg)


@EX
@given(st.lists(st.lists(words, min_size=0, max_size=20).map(" ".join), min_size=1, max_size=6))
def test_passage_dedup_matches_bruteforce(spark, docs):
    """Spark passage tiling/dup-ranking vs a direct Python computation on
    random small corpora — catches tiling off-by-ones and rank-order bugs
    the planted fixture can't."""

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # brute force: 8-token non-overlapping tiles, duplicate iff an
    # identical passage occurs earlier in (doc_id, tile_idx) order
    tiles = []
    for doc_id, text in rows:
        toks = [w for w in text.split() if w]
        for ti in range(len(toks) // 8):
            tiles.append((doc_id, ti, " ".join(toks[ti * 8 : ti * 8 + 8])))
    seen: dict = {}
    expect: dict = {}
    for doc_id, ti, passage in sorted(tiles):
        n, d = expect.get(doc_id, (0, 0))
        dup = passage in seen
        expect[doc_id] = (n + 1, d + (1 if dup else 0))
        seen.setdefault(passage, (doc_id, ti))

    # run the same plan body against the constructed frame (the catalog
    # query reads the fixture; this mirrors its exact expression tree)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from sec_dl_spark.functions.text import tokenize

    tk = df.select("doc_id", tokenize(F.col("text")).alias("toks")).where(
        F.size("toks") >= 8
    )
    tiles_df = tk.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(toks) div 8 - 1), "
                "i -> concat_ws(' ', slice(toks, i*8+1, 8)))"
            )
        ).alias("tile_idx", "passage"),
    )
    w = Window.partitionBy("passage").orderBy("doc_id", "tile_idx")
    got = {
        r["doc_id"]: (r["n"], r["d"])
        for r in tiles_df.withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("d"),
        )
        .collect()
    }
    assert got == expect


@EX
@given(st.lists(words, min_size=1, max_size=15).map(" ".join))
def test_word_entropy_matches_bruteforce(spark, text):
    """H = ln n − Σ c·ln c / n must equal the direct Shannon entropy."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F
    from sec_dl_spark.functions.text import tokenize

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    wc = (
        df.select("doc_id", F.explode(tokenize(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    row = (
        wc.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            (
                F.log(F.sum("c").cast("double"))
                - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / F.sum("c")
            ).alias("h"),
        )
        .collect()
    )
    toks = [w for w in text.split() if w]
    counts = Counter(toks)
    n = len(toks)
    expect = -sum((c / n) * math.log(c / n) for c in counts.values())
    assert row[0]["n"] == n
    assert abs(row[0]["h"] - expect) < 1e-9


@EX
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 200)),
        min_size=0,
        max_size=10,
    ),
    st.integers(1, 7),
)
def test_interval_overlap_pairs_matches_bruteforce(spark, raw, bucket_s):
    """Bucketed interval self-join == quadratic reference for random
    intervals and random bucket widths (including widths far smaller and
    far larger than the intervals)."""
    from sec_dl_spark.operators.relational import interval_overlap_pairs

    rows = [(k, s * 1_000_000, (s + d) * 1_000_000) for k, (s, d) in enumerate(raw)]
    if not rows:
        return
    iv = spark.createDataFrame(rows, "k long, s_us long, e_us long")
    got = {
        (r["a_k"], r["b_k"]): r["overlap_us"]
        for r in interval_overlap_pairs(
            iv, key_cols=["k"], bucket_seconds=bucket_s
        ).collect()
    }
    want = {
        (ka, kb): min(ea, eb) - max(sa, sb)
        for ka, sa, ea in rows
        for kb, sb, eb in rows
        if ka < kb and sa <= eb and sb <= ea
    }
    assert got == want


@EX
@given(st.lists(st.text(alphabet="ab1 .-X", min_size=0, max_size=12), min_size=1, max_size=6))
def test_trigram_sets_match_python_reference(spark, strings):
    """Spark trigram extraction == the pg_trgm python reference for
    arbitrary strings (mixed case, digits, punctuation runs, empties)."""
    import re

    from sec_dl_spark.operators.fts import trigrams_expr

    def py_trgm(s):
        out = set()
        for w in re.split(r"[^a-z0-9]+", s.lower()):
            if not w:
                continue
            p = f"  {w} "
            out |= {p[i : i + 3] for i in range(len(p) - 2)}
        return out

    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i long, s string")
    rows = df.select("i", trigrams_expr("s").alias("tg")).collect()
    for r in rows:
        assert set(r["tg"]) == py_trgm(strings[r["i"]]), strings[r["i"]]
        assert len(r["tg"]) == len(set(r["tg"]))  # distinct, no dupes


@EX
@given(
    st.lists(
        st.lists(st.floats(-2, 2, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=2,
        max_size=8,
    )
)
def test_hamming_matches_signbit_reference(spark, vecs):
    """Packed Hamming distance == python sign-bit reference for random
    short vectors (including exact zeros, which are NOT positive on
    either side)."""
    from sec_dl_spark.operators.similarity import binary_quantize, hamming_expr

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    a = binary_quantize(df).withColumnRenamed("vec_id", "ia").withColumnRenamed("sig", "sa")
    b = binary_quantize(df).withColumnRenamed("vec_id", "ib").withColumnRenamed("sig", "sb")
    got = {
        (r["ia"], r["ib"]): r["h"]
        for r in a.crossJoin(b)
        .where(F.col("ia") < F.col("ib"))
        .select("ia", "ib", hamming_expr("sa", "sb").alias("h"))
        .collect()
    }
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            want = sum((x > 0) != (y > 0) for x, y in zip(vecs[i], vecs[j]))
            assert got[(i, j)] == want
