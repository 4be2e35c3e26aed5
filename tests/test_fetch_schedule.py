"""Politeness crawl scheduling (operators/urls.py fetch_schedule)."""

import pytest

from navigator_document_parser_spark.operators.urls import fetch_schedule


def _plan(spark, hosts_urls):
    rows = [
        (f"https://{h}/{p}", h) for h, paths in hosts_urls for p in paths
    ]
    return spark.createDataFrame(rows, "url string, host string")


def test_one_worker_owns_each_host(spark):
    plan = _plan(
        spark,
        [(f"h{i}.org", [f"p{j}" for j in range(5)]) for i in range(20)],
    )
    rows = fetch_schedule(plan, n_workers=4).collect()
    owners = {}
    for r in rows:
        owners.setdefault(r["host"], set()).add(r["worker"])
        assert 0 <= r["worker"] < 4
    assert all(len(w) == 1 for w in owners.values())


def test_slots_are_a_permutation_per_worker(spark):
    plan = _plan(
        spark, [(f"h{i}.org", [f"p{j}" for j in range(3)]) for i in range(9)]
    )
    rows = fetch_schedule(plan, n_workers=3).collect()
    per_worker = {}
    for r in rows:
        per_worker.setdefault(r["worker"], []).append(r["slot"])
    for slots in per_worker.values():
        assert sorted(slots) == list(range(1, len(slots) + 1))


def test_breadth_first_interleave_spaces_hosts(spark):
    # force all hosts to one worker's perspective by checking per worker:
    # between two consecutive fetches of host X there is a fetch of every
    # OTHER host the worker owns that still has urls at that depth
    plan = _plan(
        spark, [(f"h{i}.org", [f"p{j}" for j in range(4)]) for i in range(12)]
    )
    rows = fetch_schedule(plan, n_workers=2).collect()
    by_worker = {}
    for r in rows:
        by_worker.setdefault(r["worker"], []).append(r)
    for worker_rows in by_worker.values():
        worker_rows.sort(key=lambda r: r["slot"])
        hosts = {r["host"] for r in worker_rows}
        if len(hosts) < 2:
            continue
        seq = [r["host"] for r in worker_rows]
        # same host never fetched twice in a row (equal-depth queues)
        assert all(a != b for a, b in zip(seq, seq[1:]))
        # and the first len(hosts) slots hit every host once (BFS level)
        assert set(seq[: len(hosts)]) == hosts


def test_rejects_bad_workers(spark):
    with pytest.raises(ValueError):
        fetch_schedule(_plan(spark, [("h.org", ["p"])]), n_workers=0)
