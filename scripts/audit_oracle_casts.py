#!/usr/bin/env python3
"""Audit oracle SQL for DuckDB integer-widening leaks (dev tool only).

DuckDB widens integer aggregates: ``sum(BIGINT)`` — and every window
``sum(...) over (...)`` on an integer column — yields HUGEINT (int128).
Spark has no int128, so a HUGEINT that survives to an oracle query's
OUTPUT schema can never hash-match the Spark result (r7's q103 bite,
fixed by a cast; this audit exists so the third bite is caught before
the driver's round, per VERDICT r9 item 6).

Two checks per oracle query:

1. EXACT (pass/fail): ``DESCRIBE`` the query against the fixture views
   and flag any output column typed HUGEINT/UHUGEINT. This type-checks
   the whole CTE chain the way the driver's run would and catches the
   actual failure class.
2. STATIC (warn-only): flag window ``sum(...) over (...)`` spans that
   feed arithmetic (an operator directly before or after the span)
   without a ``cast(`` wrapper — the pattern that produced the bite.
   Warn-only because cast-at-output makes intermediate widening benign
   (DuckDB's ``/`` on hugeint already yields DOUBLE, same as bigint).

Usage:
  audit_oracle_casts.py <sfDir> <oracle_sql.json>   # audit a catalog dump
  audit_oracle_casts.py --selftest                  # seeded counterexample
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WINDOW_SUM = re.compile(r"\bsum\s*\(", re.I)


def _span_end(sql: str, open_paren: int) -> int:
    """Index just past the matching ')' for the '(' at open_paren."""
    depth = 0
    for i in range(open_paren, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return len(sql)


def _window_sum_spans(sql: str):
    """(start, end) spans of `sum(...) over (...)` (end past the over)."""
    for m in WINDOW_SUM.finditer(sql):
        arg_end = _span_end(sql, sql.index("(", m.start()))
        over = re.match(r"\s*over\s*\(", sql[arg_end:], re.I)
        if over:
            yield m.start(), arg_end + _span_end(sql[arg_end:],
                                                 arg_end + over.end() - 1
                                                 - arg_end)


def _cast_wrapped(sql: str, start: int) -> bool:
    """True if a cast( opened before `start` is still open at `start`."""
    prefix = sql[:start].lower()
    for m in re.finditer(r"\bcast\s*\(", prefix):
        if _span_end(sql, sql.index("(", m.start())) > start:
            return True
    return False


def static_warnings(sql: str):
    for start, end in _window_sum_spans(sql):
        before = re.search(r"[-+*/%]\s*$", sql[:start])
        after = re.match(r"\s*[-+*/%]", sql[end:])
        if (before or after) and not _cast_wrapped(sql, start):
            yield (f"window sum at char {start} feeds arithmetic without "
                   f"a cast wrapper: ...{sql[max(0, start - 20):end + 10]}...")


def describe_failures(con, sql: str):
    try:
        cols = con.sql(f"DESCRIBE ({sql})").fetchall()
    except Exception as e:  # noqa: BLE001 - report, don't crash the audit
        yield f"DESCRIBE failed: {e}"
        return
    for row in cols:
        name, typ = row[0], str(row[1]).upper()
        if "HUGEINT" in typ:
            yield (f"output column `{name}` is {typ} — Spark has no "
                   "int128; wrap in CAST(... AS BIGINT/DOUBLE)")


def connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def selftest() -> None:
    con = duckdb.connect()
    con.sql("CREATE VIEW orders AS SELECT * FROM (VALUES (1, 'O'), (2, 'F'))"
            " t(o_custkey, o_orderstatus)")
    # direct arithmetic on the window sum — the static pattern
    bad_direct = ("SELECT sum(o_custkey) OVER "
                  "(PARTITION BY o_orderstatus) - 1 AS x FROM orders")
    # arithmetic via an alias — invisible to the static check, caught by
    # DESCRIBE (the r7 q103 shape)
    bad_alias = ("SELECT s - 1 AS x FROM (SELECT sum(o_custkey) OVER "
                 "(PARTITION BY o_orderstatus) AS s FROM orders) t")
    good = ("SELECT CAST(sum(o_custkey) OVER "
            "(PARTITION BY o_orderstatus) AS BIGINT) - 1 AS x FROM orders")
    assert list(describe_failures(con, bad_direct)), \
        "selftest: DESCRIBE check missed the direct hugeint output"
    assert list(static_warnings(bad_direct)), \
        "selftest: static check missed the uncast window sum"
    assert list(describe_failures(con, bad_alias)), \
        "selftest: DESCRIBE check missed the alias-indirect hugeint"
    good_desc = list(describe_failures(con, good))
    good_static = list(static_warnings(good))
    assert not good_desc, f"selftest: cast version flagged: {good_desc}"
    assert not good_static, f"selftest: cast version warned: {good_static}"
    print("selftest OK: both counterexamples flagged, cast version clean")


def main() -> None:
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    con = connect(sf_dir)
    oracle = json.load(open(oracle_json))
    n_fail = n_warn = 0
    for name, sql in sorted(oracle.items()):
        for msg in describe_failures(con, sql):
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        for msg in static_warnings(sql):
            print(f"WARN {name}: {msg}")
            n_warn += 1
    print(f"\n{len(oracle)} queries audited: {n_fail} failures, "
          f"{n_warn} warnings")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
