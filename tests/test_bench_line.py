"""The bench artifact line must fit the grading driver's 2,000-byte tail
capture — round-9 lesson: the ~450-byte lap_policy prose plus four new
headliners pushed the line to ~2.4 kB and BENCH_r09.json archived as
parsed:null with the first ~10 headliner timings lost. The budget is
enforced here against the WORST-CASE rendered envelope for the current
headliner count, so adding headliners forces a conscious size decision
instead of a silently truncated artifact (no Spark needed — the envelope
builder is pure)."""

import json

from bench import (
    BENCH_QUERIES,
    LINE_BYTE_BUDGET,
    build_output,
    render_line,
)


def _worst_case_line() -> str:
    # every headliner present at a 5-char timing (no real headliner reads
    # 3-digit seconds at sf0.1 — the whole run is ~55 s; 2-decimal
    # rounding is part of the budget), noisy probe block fully populated,
    # prior-artifact key present
    timings = {n: 99.99 for n in BENCH_QUERIES}
    probe = {
        "min": 0.071,
        "median": 0.085,
        "max": 9.999,
        "noisy": True,
        "flagged_queries": [],
    }
    out = build_output(
        timings,
        sum(timings.values()),
        0.1,
        probe,
        "BENCH_r09.json",
        [],
        [],
        {},
        load1=999.9,  # no realistic 1-min load renders wider than this
    )
    return render_line(out)


def test_line_fits_driver_tail_capture():
    line = _worst_case_line()
    assert len(line.encode()) <= LINE_BYTE_BUDGET, (
        f"bench artifact line is {len(line.encode())} bytes for "
        f"{len(BENCH_QUERIES)} headliners — over the {LINE_BYTE_BUDGET} "
        "budget; the driver tail-captures 2,000 bytes and a longer line "
        "archives as parsed:null (round-9 scar). Shorten the envelope "
        "or trim headliner names before adding more queries."
    )


def test_line_round_trips_as_json():
    d = json.loads(_worst_case_line())
    assert d["metric"] == "headline_queries_total_wall"
    assert d["unit"] == "sec"
    assert set(d["queries"]) == set(BENCH_QUERIES)
    assert d["sf"] == 0.1
    # prior_artifact present = the stall guard RAN; the relapped/suspect
    # lists are omitted when empty (absence IS the clean verdict)
    assert d["prior_artifact"] == "BENCH_r09.json"
    assert "relapped_vs_prior" not in d and "suspect_vs_prior" not in d
    # the host-epoch key (judge advisory r10): load average rides the
    # envelope so artifact comparisons can normalize host state
    assert d["load"] == 999.9


def test_relap_names_fit_inside_hard_cap():
    # even with EVERY query relapped/suspect, the line must stay under
    # the driver's HARD 2,000-byte tail: the diagnostic lists are
    # bounded by design (2 names + a count marker) so a many-query
    # stall event cannot truncate the artifact
    timings = {n: 99.99 for n in BENCH_QUERIES}
    long_names = sorted(BENCH_QUERIES, key=len, reverse=True)
    out = build_output(
        timings,
        sum(timings.values()),
        0.1,
        {"min": 0.071, "median": 0.085, "max": 9.999, "noisy": True,
         "flagged_queries": []},
        "BENCH_r09.json",
        long_names,
        long_names,
        {},
    )
    line = render_line(out)
    assert len(line.encode()) <= 2000
    d = json.loads(line)
    # at the current headliner count both lists degrade to counts (the
    # self-degrading envelope); the counts carry the event either way
    n = len(BENCH_QUERIES)
    if "relapped_vs_prior" in d:
        assert d["relapped_vs_prior"][2] == f"+{n - 2} more"
    else:
        assert d["relapped_vs_prior_n"] == n and d["suspect_vs_prior_n"] == n


def test_errors_are_bounded_per_entry():
    # a Py4J exception str() is multi-KB of JVM stack; unbounded error
    # text would blow the tail capture exactly like the lap_policy prose
    # did (review finding). Multi-KB errors must still render inside the
    # hard cap — with named, bounded text when the line has room, and
    # degraded to the bare count (errors_n, the round-11 unconditional
    # final rung) when the full-timings body leaves none.
    for n_err in (2, 10):
        bad = BENCH_QUERIES[:n_err]
        timings = {n: 99.99 for n in BENCH_QUERIES if n not in bad}
        errors = {n: "AnalysisException: " + "x" * 4000 for n in bad}
        out = build_output(
            timings, sum(timings.values()), 0.1,
            {"min": 0.071, "median": 0.085, "max": 9.999, "noisy": False,
             "flagged_queries": []},
            "BENCH_r09.json", [], [], errors,
        )
        line = render_line(out)
        assert len(line.encode()) <= 2000
        d = json.loads(line)
        if "errors" in d:
            for v in d["errors"].values():
                assert len(v) <= 120 and v.endswith("...")
                assert v.startswith("AnalysisException")
        else:  # degraded: the count survives, the rc is already red
            assert d["errors_n"] == n_err


def test_mass_failure_keeps_timings_and_error_count():
    # half the headliners erroring must still produce a parseable line
    # inside the cap, with every surviving timing present and the error
    # count intact (the ladder's last step)
    half = len(BENCH_QUERIES) // 2
    timings = {n: 99.99 for n in BENCH_QUERIES[half:]}
    errors = {
        n: "Py4JJavaError: " + "y" * 3000 for n in BENCH_QUERIES[:half]
    }
    out = build_output(
        timings, sum(timings.values()), 0.1,
        {"min": 0.071, "median": 0.085, "max": 9.999, "noisy": False,
         "flagged_queries": []},
        "BENCH_r09.json", [], [], errors,
    )
    line = render_line(out)
    assert len(line.encode()) <= 2000
    d = json.loads(line)
    assert set(d["queries"]) == set(BENCH_QUERIES[half:])
    assert d.get("errors_n", len(d["errors"])) == half


def test_single_relap_keeps_names():
    # the common event — one or two relapped queries — keeps real names
    timings = {n: 99.99 for n in BENCH_QUERIES}
    out = build_output(
        timings, sum(timings.values()), 0.1,
        {"min": 0.071, "median": 0.085, "max": 9.999, "noisy": False,
         "flagged_queries": []},
        "BENCH_r09.json", ["profile_orders"], [], {},
    )
    line = render_line(out)
    assert len(line.encode()) <= 2000
    assert json.loads(line)["relapped_vs_prior"] == ["profile_orders"]
