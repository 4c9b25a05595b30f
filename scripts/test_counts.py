#!/usr/bin/env python3
"""Derive the SURVEY §8.7 test/suite counts from an `sbt test`
transcript (VERDICT r14 item 7: the counts were hand-maintained prose
that happened to match; emitting them from the transcript makes drift
impossible — SURVEY cites the committed TESTCOUNTS_r{N}.json artifact).

Usage: test_counts.py <sbt-test-transcript> <out.json>

Parses ScalaTest's run-completed summary:
    [info] Total number of tests run: 156
    [info] Suites: completed 27, aborted 0
    [info] Tests: succeeded 156, failed 0, canceled 0, ignored 0, pending 0
and sbt's exit status line if present. Exit 1 if the summary is absent
or reports failures/aborts — a counts artifact must only ever describe
a green run.
"""
import json
import re
import sys


def main(argv):
    if len(argv) != 2:
        print(__doc__)
        return 2
    text = open(argv[0], errors="replace").read()
    total = re.findall(r"Total number of tests run: (\d+)", text)
    suites = re.findall(r"Suites: completed (\d+), aborted (\d+)", text)
    tests = re.findall(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), "
        r"ignored (\d+), pending (\d+)", text)
    if not (total and suites and tests):
        print("no ScalaTest summary found in transcript")
        return 1
    # sbt prints one summary per test run; take the last (the full run)
    doc = {
        "tests_run": int(total[-1]),
        "suites_completed": int(suites[-1][0]),
        "suites_aborted": int(suites[-1][1]),
        "tests_succeeded": int(tests[-1][0]),
        "tests_failed": int(tests[-1][1]),
        "tests_canceled": int(tests[-1][2]),
        "source": "scripts/test_counts.py over the sbt test transcript",
    }
    green = (doc["suites_aborted"] == 0 and doc["tests_failed"] == 0
             and doc["tests_run"] == doc["tests_succeeded"])
    doc["green"] = green
    with open(argv[1], "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc))
    return 0 if green else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
