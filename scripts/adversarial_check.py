#!/usr/bin/env python3
"""Adversarial-fixture differential check: generate a small HOSTILE
dataset in the driver fixture's schemas — arbitrary-UTF-8 document
texts (empty/null/whitespace-only, VT/tab/newline separators, CJK,
supplementary-plane emoji, combining characters, double spaces, case
variants, exact/near duplicates) and dirty lineitem numerics
(fractional quantities, many-decimal prices, 1/512-style binary
fractions, duplicate (orderkey, linenumber) rows, a NULL quantity) —
then run the engine and the DuckDB oracle over it and compare.

The benign driver fixtures hide whole divergence classes (the
double→int cast rounding, the \\s dialect split, the VT fingerprint
fork were all invisible to them); this check makes those classes
LOUD. Only schema-legal, in-contract values are generated: document
text is an unconstrained UTF-8 domain and lineitem doubles carry no
integrality contract, so any mismatch here is a real oracle-blind
divergence, not a manufactured contract violation. (Deliberately NOT
perturbed: enum-like columns — source stays 'srcN', returnflag stays
A/N/R — and ORDER BY key columns that the driver contract keeps
non-null, where the two engines' implicit NULLS FIRST/LAST defaults
differ by design and the repo's convention is explicit directives
only where nulls are actually possible.)

Usage:
  python3 scripts/adversarial_check.py gen [fixture_dir]   # write fixture
  python3 scripts/adversarial_check.py queries             # print battery
Then:
  sbt -batch "Test/runMain graft.VerifyOne <out> <fixture_dir> $(python3 scripts/adversarial_check.py queries)"
  python3 scripts/check_oracle.py <out> <fixture_dir>
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.001"

# documents/lineitem/events-only queries (no joins to unperturbed dims)
QUERIES = [
    # events: as-of joins, windows, CEP, the KLL sketch
    "qj1_asof_join", "qj2_range_count", "qj6_asof_forward",
    "qj7_asof_nearest", "qj8_asof_tolerance", "qs11_kll_quantiles",
    "qw5_tumble", "qw7_session", "qc1_cep_view_error",
    "qc2_cep_double_error", "qc12_cep_funnel", "qw1_running_sum",
    # documents: fingerprint/dedup/gate family
    "qp1_dedup_exact", "qp2_fingerprint", "qp3_minhash_sig", "qp6_simhash",
    "qp10_paragraph_dedup", "qp15_bloom_incremental", "qp16_bloom_near_dup",
    "qp26_substring_dedup", "qp27_source_overlap", "qp29_containment_dedup",
    "qp34_winnow_fingerprints", "qp37_ingest_decision",
    # documents: text analytics
    "qt1_text_stats", "qt2_quality_score", "qt3_langid", "qt4_token_count",
    "qt6_top_ngrams", "qt7_repetition", "qt8_pii_redaction",
    "qt15_unicode_nfc", "q19_explode_words", "q30_posexplode",
    "qs8_array_funcs", "qs9_udtf_split",
    # lineitem: aggregation/set-op/scalar family
    "q1_pricing_summary", "q3_distinct_aggs", "q4_stats_aggs",
    "q8_collect_list", "q22_topk", "q26_intersect_all", "q27_except_all",
    "q32_corr_covar", "qs2_math_funcs", "qs7_collect_multiset",
    "qs15_histogram",
]


def documents_rows():
    rows = []

    def d(i, text, lang="en", src=None):
        rows.append((i, text, lang, src or f"src{i % 20}",
                     len(text) if text is not None else None))

    base = "the quick brown fox jumps over the lazy dog again and again"
    d(0, base)
    d(1, base, src="src11")                      # exact cross-source dup
    d(2, "The QUICK Brown fox Jumps Over the lazy DOG again and again")
    d(3, "the  quick brown  fox jumps over the lazy dog again and again")
    d(4, "")                                     # empty text
    d(5, None)                                   # NULL text
    d(6, "   ")                                  # whitespace-only
    d(7, "one")                                  # single token
    d(8, "two tokens")                           # below shingle width
    d(9, "a b c")                                # minimal shingle
    d(10, "alpha\x0bbeta gamma delta epsilon zeta eta theta")   # VT
    d(11, "alpha\tbeta\ngamma delta epsilon zeta eta theta")    # tab/NL
    d(12, "café naïve résumé coöperate Zürich tokens")
    d(13, "你好 世界 机器 学习 模型 训练")
    d(14, "\U0001f984 unicorn \U0001f409 dragon \U0001d11e clef tokens here")
    d(15, "café naïve test tokens for the normalizer here")
    d(16, "spam spam spam spam spam spam spam spam")
    d(17, "prefix words then " + base + " and a suffix tail here")
    d(18, "ALPHA BETA GAMMA DELTA EPSILON UNIQ18")
    d(19, "alpha beta gamma delta epsilon uniq18", src="src13")  # lower twin
    d(20, "hello, world! (parens) [brackets] {braces} #hash $dollar end.")
    d(21, "Contact me at alice@example.com or call 555-123-4567 today")
    d(22, "server at 192.168.1.1 responded and logged the request body")
    # incoming-slice rows (src10+) that near-duplicate corpus rows for
    # the gate/bloom queries
    d(23, base + " extended with new trailing words", src="src14")
    d(24, "totally novel sentence with its own vocabulary entirely",
      src="src15")
    for i in range(25, 40):
        d(i, f"document number {i} shares corpus vocabulary with others "
             f"plus marker m{i} and filler words common to many docs")
    d(41, None, src="src16")                     # NULL text, INCOMING slice
    return rows


def lineitem_rows():
    rows = []
    flags = ["A", "N", "R"]

    def li(ok, pk, sk, ln, qty, price, disc, tax, rf, ls, ship):
        rows.append((ok, pk, sk, ln, qty, price, disc, tax, rf, ls, ship))

    import datetime
    t = datetime.datetime(1997, 6, 1)
    cut = datetime.datetime(1998, 9, 2)          # exactly q1's cutoff
    li(1, 10, 100, 1, 2.5, 1234.5678901, 0.05, 0.02, "A", "O", t)
    li(1, 11, 101, 2, 2.6, 0.001953125, 0.001953125, 0.0, "N", "F", t)
    li(1, 11, 101, 2, 2.6, 0.001953125, 0.001953125, 0.0, "N", "F", t)  # dup
    li(2, 12, 102, 1, 17.0, 1234.56, 0.0999999, 0.08, "R", "O", cut)
    li(2, 13, 103, 2, None, 999.99, 0.04, 0.01, "A", "F", t)   # NULL qty
    li(3, 10, 100, 1, 7.75, 55.5, 0.05, 0.0, "A", "O",
       datetime.datetime(1999, 1, 1))                           # past cutoff
    li(50, 14, 104, 1, None, 100.0, 0.02, 0.01, "N", "O", t)    # only-NULL
    li(50, 15, 105, 2, None, 200.0, 0.03, 0.02, "N", "F", t)    # qty group
    for i in range(4, 24):
        li(i, 10 + i % 7, 100 + i % 5, 1 + i % 3,
           float(1 + i % 50) + (0.5 if i % 4 == 0 else 0.0),
           100.0 + i * 13.37, 0.01 * (i % 10), 0.01 * (i % 8),
           flags[i % 3], "OF"[i % 2], t + datetime.timedelta(days=i * 30))
    return rows


def events_rows():
    """Adversarial events: same-timestamp CROSS-TYPE ties (the (ts,
    event_id) total order must resolve them identically in both
    engines), NULL and dirty values, NULL props, users with missing
    pattern steps. The documented data contract is respected: ts is
    never NULL (event time is the stream order) and (user_id, ts) is
    unique WITHIN an event type (the AsofQueries determinism
    contract)."""
    import datetime
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = []

    def e(i, mins, user, typ, value, props="{}"):
        rows.append((i, base + datetime.timedelta(minutes=mins), user,
                     typ, value, props))

    e(1, 0, 1, "view", 1.5)
    e(2, 0, 1, "error", None)        # same ts as the view; NULL value
    e(3, 10, 1, "purchase", 99.99, None)
    e(4, 70, 1, "error", 2.0)        # past qc1's 1h window from e1
    e(5, 0, 2, "view", 0.001953125)
    e(6, 10, 2, "view", -1.0)
    e(7, 15, 2, "error", 0.0)
    e(8, 20, 2, "view", None)
    e(9, 25, 2, "error", 3.25)
    e(10, 1000, 2, "purchase", 7.0)
    e(11, 5, 3, "view", 4.0)         # user 3: views only (no error)
    e(12, 95, 3, "view", 5.0)
    e(13, 50, 4, "purchase", 6.0)    # user 4: purchase, no prior view
    e(14, 0, 5, "view", 1.0)
    e(15, 0, 5, "click", 2.0)        # three-type tie at one instant
    e(16, 0, 5, "signup", 3.0)
    e(17, 30, 5, "purchase", -1.0)
    nid = 18
    for u in range(6, 10):
        for j in range(5):
            typ = ["view", "error", "purchase", "click"][(u + j) % 4]
            e(nid, u * 7 + j * 11, u, typ,
              None if (u + j) % 5 == 0 else 0.5 * u + j * 0.125,
              None if j % 3 == 0 else '{"k":%d}' % j)
            nid += 1
    return rows


def gen(outdir):
    import os
    os.makedirs(outdir, exist_ok=True)
    # unperturbed tables: copy the benign fixture (queries in the battery
    # never touch them, but Verify-style harnesses may list the dir)
    for tname in ["region", "nation", "customer", "supplier", "part",
                  "orders", "embeddings"]:
        shutil.copyfile(f"{BASE}/{tname}.parquet", f"{outdir}/{tname}.parquet")

    ev = events_rows()
    ecols = list(zip(*ev))
    pq.write_table(pa.table({
        "event_id": pa.array(ecols[0], pa.int64()),
        "ts": pa.array(ecols[1], pa.timestamp("us")),
        "user_id": pa.array(ecols[2], pa.int64()),
        "event_type": pa.array(ecols[3], pa.string()),
        "value": pa.array(ecols[4], pa.float64()),
        "props": pa.array(ecols[5], pa.string()),
    }), f"{outdir}/events.parquet")

    docs = documents_rows()
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in docs], pa.int64()),
        "text": pa.array([r[1] for r in docs], pa.string()),
        "lang": pa.array([r[2] for r in docs], pa.string()),
        "source": pa.array([r[3] for r in docs], pa.string()),
        "n_chars": pa.array([r[4] for r in docs], pa.int64()),
    }), f"{outdir}/documents.parquet")

    li = lineitem_rows()
    cols = list(zip(*li))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(cols[0], pa.int64()),
        "l_partkey": pa.array(cols[1], pa.int64()),
        "l_suppkey": pa.array(cols[2], pa.int64()),
        "l_linenumber": pa.array(cols[3], pa.int32()),
        "l_quantity": pa.array(cols[4], pa.float64()),
        "l_extendedprice": pa.array(cols[5], pa.float64()),
        "l_discount": pa.array(cols[6], pa.float64()),
        "l_tax": pa.array(cols[7], pa.float64()),
        "l_returnflag": pa.array(cols[8], pa.string()),
        "l_linestatus": pa.array(cols[9], pa.string()),
        "l_shipdate": pa.array(cols[10], pa.timestamp("us")),
    }), f"{outdir}/lineitem.parquet")
    print(f"wrote adversarial fixture to {outdir} "
          f"({len(docs)} documents, {len(li)} lineitems, {len(ev)} events)")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "gen"
    if cmd == "gen":
        gen(sys.argv[2] if len(sys.argv) > 2 else "/tmp/advfx")
    elif cmd == "queries":
        print(" ".join(QUERIES))
    else:
        sys.exit(f"unknown command {cmd}")
