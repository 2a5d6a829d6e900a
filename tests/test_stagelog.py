"""Unit tests for stagelog.stage_scaling_table — the plan-node pairing
that replaced round-3's positional zip (VERDICT r3 task 2, ADVICE r3).

Pure Python, no Spark session: the function consumes already-parsed
stage dicts, so the tests feed synthetic event-log rows directly.
"""
from angola_erp_ocr_spark.stagelog import stage_scaling_table


def _stage(name, sub, wall, tasks=8, occ_shuffle=0.0, exec_run=None):
    return {
        "stage_id": sub,
        "name": name,
        "tasks": tasks,
        "submitted_ms": sub,
        "wall_ms": wall,
        "exec_run_ms": exec_run if exec_run is not None else wall * tasks,
        "exec_cpu_ms": 0,
        "shuffle_write_mb": 0.0,
        "shuffle_read_mb": occ_shuffle,
    }


def test_pairs_by_name_occurrence_not_position():
    """An extra AQE-only stage at the big level must NOT shift the pairing
    of everything after it (the positional-zip failure mode that printed
    0.03/9.27-class 'efficiencies' in the r3 tables)."""
    small = [
        _stage("scan parquet", 0, 2000),
        _stage("collect at run.py:74", 10, 40000),
        _stage("collect at run.py:74", 20, 80000),
    ]
    big = [
        _stage("scan parquet", 0, 600),
        _stage("aqe shuffle coalesce", 5, 300),  # only exists at big
        _stage("collect at run.py:74", 10, 11000),
        _stage("collect at run.py:74", 20, 21000),
    ]
    rows = stage_scaling_table(small, big, factor=4)
    by_key = {(r["name"], r["occurrence"]): r for r in rows}

    # the two same-named collects pair 1st-with-1st, 2nd-with-2nd
    c0 = by_key[("collect at run.py:74", 0)]
    c1 = by_key[("collect at run.py:74", 1)]
    assert (c0["wall_ms_small"], c0["wall_ms_big"]) == (40000, 11000)
    assert (c1["wall_ms_small"], c1["wall_ms_big"]) == (80000, 21000)
    assert c0["efficiency"] == round(40000 / (4 * 11000), 3)
    assert c1["efficiency"] == round(80000 / (4 * 21000), 3)

    # the AQE stage is surfaced as unpaired with no efficiency, not dropped
    aqe = by_key[("aqe shuffle coalesce", 0)]
    assert aqe["unpaired"] == "big"
    assert aqe["efficiency"] is None


def test_negligible_rows_carry_no_efficiency():
    """Both walls under the threshold → fixed overhead: flagged, and the
    wall ratio (which would read as an absurd 'efficiency') is suppressed."""
    small = [_stage("overhead", 0, 38), _stage("work", 10, 9000)]
    big = [_stage("overhead", 0, 14), _stage("work", 10, 2500)]
    rows = stage_scaling_table(small, big, factor=4, negligible_ms=1000)
    by_name = {r["name"]: r for r in rows}
    assert by_name["overhead"]["negligible"] is True
    assert by_name["overhead"]["efficiency"] is None
    assert by_name["work"]["negligible"] is False
    assert by_name["work"]["efficiency"] == round(9000 / (4 * 2500), 3)


def test_rows_ordered_by_first_submission():
    small = [_stage("a", 100, 5000), _stage("b", 200, 5000)]
    big = [_stage("z_first_at_big", 0, 5000),
           _stage("a", 100, 1250), _stage("b", 200, 1250)]
    rows = stage_scaling_table(small, big, factor=4)
    assert [r["name"] for r in rows] == ["z_first_at_big", "a", "b"]
    assert [r["idx"] for r in rows] == [0, 1, 2]


def test_order_is_per_run_plan_position_not_cross_run_clock():
    """The two runs' clocks are unrelated (ADVICE r4): a big run whose
    absolute timestamps all EXCEED the small run's must still interleave
    its unpaired stages at their plan position, not after every small
    stage; small-only stages slot before the shared stage that follows
    them in the small run's own order."""
    small = [_stage("a", 100, 5000), _stage("small_only", 150, 900),
             _stage("b", 200, 5000)]
    # big clock starts at 1e9 — every big timestamp > every small one
    big = [_stage("a", 1_000_000_000, 1250),
           _stage("big_only_mid", 1_000_000_100, 700),
           _stage("b", 1_000_000_200, 1250)]
    rows = stage_scaling_table(small, big, factor=4)
    names = [r["name"] for r in rows]
    # both unpaired stages land BETWEEN their shared anchors a and b
    # (their order relative to each other is genuinely ambiguous)
    assert names[0] == "a" and names[-1] == "b"
    assert set(names[1:3]) == {"small_only", "big_only_mid"}
    by_name = {r["name"]: r for r in rows}
    assert by_name["small_only"]["unpaired"] == "small"
    assert by_name["big_only_mid"]["unpaired"] == "big"
    assert by_name["a"]["efficiency"] == 1.0


def test_pairing_by_plan_sig_survives_shared_callsite():
    """r5 official-run wart: when every stage shares one materialization
    callsite (a driver that collects each query from the same line),
    name-based pairing degrades to positional and misaligns as soon as
    AQE decomposes the two levels into different stage counts. plan_sig
    (the RDD-scope set) pairs the stages by WHAT they compute."""
    from angola_erp_ocr_spark.stagelog import stage_scaling_table

    def st(sig, sub, wall, tasks=4, rd=0.0):
        return dict(name="collect at run.py:74", plan_sig=sig,
                    submitted_ms=sub, wall_ms=wall, tasks=tasks,
                    exec_run_ms=wall * tasks, shuffle_read_mb=rd)

    # small level: scan → ocr python stage → window tail
    small = [st("Exchange|Scan parquet|WholeStageCodegen (1)", 0, 40_000),
             st("ArrowEvalPython|Exchange|WholeStageCodegen (2)", 1, 100_000),
             st("AQEShuffleRead|Window|WholeStageCodegen (3)", 2, 20_000,
                rd=1000.0)]
    # big level: AQE inserts an extra shuffle-read stage between them
    big = [st("Exchange|Scan parquet|WholeStageCodegen (1)", 0, 11_000),
           st("AQEShuffleRead|Exchange", 1, 500),
           st("ArrowEvalPython|Exchange|WholeStageCodegen (2)", 2, 26_000),
           st("AQEShuffleRead|Window|WholeStageCodegen (3)", 3, 6_000,
              rd=1000.0)]
    rows = stage_scaling_table(small, big)
    by_sig = {r["name"]: r for r in rows}
    # the three shared plan nodes pair 1:1 despite the shared callsite
    assert round(by_sig["Exchange|Scan parquet|WholeStageCodegen (1)"]
                 ["efficiency"], 3) == round(40_000 / (4 * 11_000), 3)
    assert round(by_sig["ArrowEvalPython|Exchange|WholeStageCodegen (2)"]
                 ["efficiency"], 3) == round(100_000 / (4 * 26_000), 3)
    assert round(by_sig["AQEShuffleRead|Window|WholeStageCodegen (3)"]
                 ["efficiency"], 3) == round(20_000 / (4 * 6_000), 3)
    # the AQE-only stage surfaces as unpaired-big, no fake efficiency
    extra = by_sig["AQEShuffleRead|Exchange"]
    assert extra["unpaired"] == "big" and extra["efficiency"] is None
