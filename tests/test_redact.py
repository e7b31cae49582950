"""PII redaction gates (ops/redact.py).

1. Category battery: emails, IPv4s, phone runs are replaced with typed
   tokens and counted; near-misses (prices, years, versions, bare
   domains) are left alone.
2. Cross-dialect fidelity: redact_pii_sql() produces identical redacted
   text and counts in DuckDB for every battery case.
3. Replacement order: a string consumed by an earlier category never
   double-counts into a later one.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops import redact as R  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="redact-test")


# (text, redacted, n_email, n_ipv4, n_phone)
BATTERY = [
    ("mail bob.smith+tag@sub.example.co.uk today",
     "mail <EMAIL> today", 1, 0, 0),
    ("server at 10.0.255.1 and 192.168.1.1 up",
     "server at <IP> and <IP> up", 0, 2, 0),
    ("call +1 (555) 123-4567 or 020 7946 0958 now",
     "call <PHONE> or <PHONE> now", 0, 0, 2),
    ("price 12.99 in 2024, version 1.2.3.4 is ok",
     "price 12.99 in 2024, version <IP> is ok", 0, 1, 0),
    ("visit example.com or a@b.io", "visit example.com or <EMAIL>", 1, 0, 0),
    ("two mails a@x.org b@y.net one ip 8.8.8.8",
     "two mails <EMAIL> <EMAIL> one ip <IP>", 2, 1, 0),
    ("no pii here at all", "no pii here at all", 0, 0, 0),
    ("short digits 123-4567 stay", "short digits 123-4567 stay", 0, 0, 0),
    ("", "", 0, 0, 0),
]


@pytest.fixture(scope="module")
def results(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(BATTERY)],
        "doc_id: long, text: string")
    sp = {r["doc_id"]: r for r in R.redact_pii(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    for i, (t, *_) in enumerate(BATTERY):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, t])
    dk = {r[0]: r for r in con.execute(
        f"SELECT doc_id, {R.redact_pii_sql('text')} FROM t").fetchall()}
    return sp, dk


def test_battery_semantics(results):
    sp, _ = results
    for i, (t, red, ne, ni, np_) in enumerate(BATTERY):
        r = sp[i]
        assert r["text_redacted"] == red, f"{t!r}: {r['text_redacted']!r}"
        assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (ne, ni, np_), t


def test_cross_dialect_identical(results):
    sp, dk = results
    for i in range(len(BATTERY)):
        s, d = sp[i], dk[i]
        assert s["text_redacted"] == d[1]
        assert (s["n_email"], s["n_ipv4"], s["n_phone"]) == (d[2], d[3], d[4])
