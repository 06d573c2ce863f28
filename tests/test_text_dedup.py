"""Independent references for the part-8 text ops — the DuckDB parity
suite already cross-checks both engines; these tests re-derive the
expected answers in pure Python straight from the parquet, so a shared
misreading of the spec on both SQL sides cannot pass silently."""

from __future__ import annotations

import pandas as pd

from mapshaper_spark import queries as Q

from .conftest import SF_SMOKE

L = 4  # span gram length pinned in exact_substring_spans


def _spans_reference(texts: dict[int, list[str]]):
    """Pure-Python ExactSubstr spans: positioned L-grams, occurrence
    counts, per-doc interval merge of [p, p+L-1] windows."""
    occ: dict[str, int] = {}
    pos: dict[int, list[int]] = {}
    for doc, t in texts.items():
        ps = []
        for i in range(max(len(t) - L + 1, 0)):
            g = " ".join(t[i : i + L])
            occ[g] = occ.get(g, 0) + 1
            ps.append((i, g))
        pos[doc] = ps
    out = {}
    for doc, t in texts.items():
        dup = [i for i, g in pos[doc] if occ[g] >= 2]
        spans = []
        for p in dup:
            # merge when the new window [p, p+L-1] overlaps or touches
            # the running span (gap between starts <= L)
            if spans and p - spans[-1][1] <= L:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        dup_words = sum(e - s + L for s, e in spans)
        out[doc] = (len(t), len(spans), dup_words)
    return out


def test_exact_substring_spans_matches_python_reference(spark):
    raw = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[
        ["doc_id", "text"]
    ]
    texts = {
        int(r.doc_id): r.text.split(" ") for r in raw.itertuples()
    }
    want = _spans_reference(texts)
    got = (
        Q.QUERIES["exact_substring_spans"](spark, SF_SMOKE)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == len(want)
    multi = 0
    for doc, (n_words, n_spans, dup_words) in want.items():
        row = got.loc[doc]
        assert int(row.n_words) == n_words, doc
        assert int(row.dup_spans) == n_spans, doc
        assert int(row.dup_words) == dup_words, doc
        assert row.dup_frac == dup_words / n_words, doc
        if n_spans >= 2:
            multi += 1
    # the fixture must actually exercise the island-break branch
    assert multi >= 50


def test_exact_substring_spans_edge_docs(spark, tmp_path):
    """Cross-engine parity on the edge docs the driver fixture never
    carries: 1-word and 3-word docs (no 4-grams — zero spans, never
    dropped), an exactly-4-word duplicated pair (whole doc = one
    span, dup_frac exactly 1.0), and a doc repeating its own 4-gram
    (within-doc dup counts, per ExactSubstr)."""
    import duckdb
    import pandas as pd

    from tests.oracle_harness import normalize

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "one",
                "just three words",
                "alpha beta gamma delta",  # dup pair with doc 3
                "alpha beta gamma delta",
                # within-doc repeat: 'p q r s' occurs twice
                "p q r s x p q r s",
            ],
            "lang": ["en"] * 5,
            "source": ["src0"] * 5,
        }
    )
    docs["n_chars"] = docs.text.str.len()
    d = str(tmp_path)
    docs.to_parquet(f"{d}/documents.parquet")

    got = normalize(
        Q.QUERIES["exact_substring_spans"](spark, d).toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    want = normalize(
        con.sql(Q.ORACLES["exact_substring_spans"]).df()
    )
    pd.testing.assert_frame_equal(got, want)

    by_id = got.set_index("doc_id")
    assert by_id.loc[0].dup_spans == 0 and by_id.loc[1].dup_spans == 0
    for doc in (2, 3):
        assert by_id.loc[doc].dup_spans == 1
        assert by_id.loc[doc].dup_words == 4
        assert by_id.loc[doc].dup_frac == 1.0
    # the self-repeating doc: positions 0 and 5 both carry 'p q r s',
    # gap 5 > L=4 -> two separate spans of 4 words each
    assert by_id.loc[4].dup_spans == 2
    assert by_id.loc[4].dup_words == 8


def test_lm_familiarity_edge_docs(spark, tmp_path):
    """Cross-engine parity on edge docs: a 1-word doc carries no
    bigrams and DROPS from the output in both engines (the documented
    contract, shared with cross_doc_ngram_overlap); a 2-word doc
    scores on its single bigram."""
    import duckdb
    import pandas as pd

    from tests.oracle_harness import normalize

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 10],
            "text": ["solo", "two words", "two words"],
            "lang": ["en"] * 3,
            "source": ["src0"] * 3,
        }
    )
    docs["n_chars"] = docs.text.str.len()
    d = str(tmp_path)
    docs.to_parquet(f"{d}/documents.parquet")

    got = normalize(
        Q.QUERIES["lm_familiarity_buckets"](spark, d).toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    want = normalize(con.sql(Q.ORACLES["lm_familiarity_buckets"]).df())
    pd.testing.assert_frame_equal(got, want)
    assert set(got.doc_id) == {1, 10}  # the 1-word doc drops
    # doc 10 is the reference split: its bigram trivially matches
    row = got.set_index("doc_id").loc[10]
    assert row.n_bigrams == 1 and row.matched == 1 and row.ref_mass == 1


def test_bpe_merge_scan_contract(spark):
    """The merge pass is one left-to-right non-overlapping scan — the
    cross-engine contract bpe_apply_merges leans on, checked directly
    against both engines' replace kernels on the pathological
    self-adjacent run."""
    import duckdb

    from pyspark.sql import functions as F

    cases = [
        ("order order order", "order@order order"),
        # the scan consumes the shared delimiter space, so a run of 4
        # fires only ONE merge (the second pair has lost its leading
        # space) — and a run of 5 realigns and fires a second one.
        # Both engines implement exactly this; the expectation pins it.
        ("order order order order", "order@order order order"),
        (
            "order order order order order",
            "order@order order order@order",
        ),
        ("a order order b", "a order@order b"),
        ("order orderx order order", "order orderx order@order"),
    ]
    for text, want in cases:
        got_spark = (
            spark.range(1)
            .select(
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.lit(text), F.lit(" ")),
                        F.lit(" order order "),
                        F.lit(" order@order "),
                    )
                ).alias("m")
            )
            .first()[0]
        )
        got_duck = duckdb.sql(
            "SELECT trim(replace(' ' || ? || ' ', ' order order ',"
            " ' order@order '))",
            params=[text],
        ).fetchone()[0]
        assert got_spark == want, (text, got_spark)
        assert got_duck == want, (text, got_duck)


def test_lm_familiarity_reference_split_and_monotone_buckets(spark):
    got = Q.QUERIES["lm_familiarity_buckets"](spark, SF_SMOKE).toPandas()
    # every doc scored, all three tiers populated on the fixture
    assert set(got.bucket) == {"head", "middle", "tail"}
    # bucket assignment is exactly the documented literal thresholds
    for r in got.itertuples():
        want = (
            "head"
            if r.mean_ref_cnt >= 3.1
            else "middle" if r.mean_ref_cnt >= 2.9 else "tail"
        )
        assert r.bucket == want
    # reference-split docs score against a model containing every one
    # of their own bigrams: matched_frac == 1.0 exactly there
    ref = got[got.doc_id % 10 == 0]
    assert (ref.matched_frac == 1.0).all()
    assert (got.matched <= got.n_bigrams).all()
