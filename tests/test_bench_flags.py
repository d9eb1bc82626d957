"""Pin the bench budget-flag decision (bench.py::decide_flag).

Round-8 post-mortem: two-sided regime normalization false-flagged 33/37
queries in a loaded driver run (throughput probe fast under load -> factor
0.79 -> every wall AMPLIFIED), while the disproof — byte-identical
shuffle/input metrics — sat unused in the same sidecar. These tests pin the
round-9 contract: (a) a fast-probe factor never amplifies, (b) a uniformly
slow regime absorbs uniform wall inflation, (c) a plan change (byte growth)
flags regardless of wall, (d) a genuine idle-host wall regression still
flags. No SparkSession needed — decide_flag is a pure function.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_BENCH = Path(__file__).resolve().parents[1] / "bench.py"
_spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench_module", bench)
_spec.loader.exec_module(bench)

decide_flag = bench.decide_flag
demote_uniform_wall_flags = bench.demote_uniform_wall_flags

_M = {"shuffle_read_bytes": 1_000_000, "input_bytes": 50_000_000}


def test_loaded_host_fast_probe_never_amplifies():
    # The round-8 failure mode: latency up ~1.35x under load, probe factor
    # 0.79 (throughput regime FAST). One-sided divisor = max(0.79, 1) = 1,
    # raw ratio 1.35 < 1.5 threshold, bytes identical -> no flag.
    assert decide_flag(1.35, 1.0, 0.79, _M, dict(_M)) is None


def test_slow_regime_absorbs_uniform_inflation():
    # Genuinely slow regime (factor 2.0): raw wall 2.6x budget normalizes
    # to 1.3x -> under threshold, bytes identical -> no flag.
    assert decide_flag(2.6, 1.0, 2.0, _M, dict(_M)) is None


def test_idle_host_wall_regression_still_flags():
    rec = decide_flag(2.0, 1.0, 1.0, _M, dict(_M))
    assert rec is not None and rec["reasons"] == ["wall"]
    assert rec["ratio_normalized"] == 2.0


def test_fast_probe_does_not_suppress_real_regression():
    # One-sided also means a fast factor can't DIVIDE a real regression
    # away: divisor is clamped at 1, so raw 1.6x stays 1.6x.
    rec = decide_flag(1.6, 1.0, 0.5, _M, dict(_M))
    assert rec is not None and "wall" in rec["reasons"]


def test_planted_plan_change_flags_on_bytes_even_with_fast_wall():
    # Disabled broadcast: shuffle read grows 40x while the wall happens to
    # be under budget (small SF) -> flag on bytes alone.
    now = {"shuffle_read_bytes": 40_000_000, "input_bytes": 50_000_000}
    rec = decide_flag(0.5, 1.0, 1.0, now, dict(_M))
    assert rec is not None and rec["reasons"] == ["shuffle_read_bytes"]
    assert rec["shuffle_read_bytes_budget"] == 1_000_000


def test_byte_decrease_is_an_improvement_not_a_flag():
    now = {"shuffle_read_bytes": 10, "input_bytes": 1_000}
    assert decide_flag(0.5, 1.0, 1.0, now, dict(_M)) is None


def test_small_absolute_jitter_below_floor_never_flags():
    # 59 B -> 30 KiB is a huge ratio but below the 64 KiB absolute floor:
    # sub-64KiB movements are AQE/compression jitter, not plan changes.
    now = {"shuffle_read_bytes": 30_000, "input_bytes": 50_000_000}
    bud = {"shuffle_read_bytes": 59, "input_bytes": 50_000_000}
    assert decide_flag(0.5, 1.0, 1.0, now, bud) is None


def test_missing_byte_budget_degrades_to_wall_only():
    assert decide_flag(1.2, 1.0, 1.0, _M, None) is None
    rec = decide_flag(2.0, 1.0, 1.0, _M, None)
    assert rec is not None and rec["reasons"] == ["wall"]


def test_loaded_host_wall_with_identical_bytes_is_suspect_not_flag():
    # The residual round-8 failure mode past the one-sided clamp: a heavy
    # concurrent load inflates one query's wall >1.5x while the throughput
    # probe under-measures the latency hit. Bytes identical + host not
    # idle -> demoted to wall_suspect (informational); the next idle run
    # re-arbitrates.
    rec = decide_flag(2.5, 1.0, 1.3, _M, dict(_M), idle=False)
    assert rec is not None and rec["reasons"] == ["wall_suspect"]


def test_idle_host_wall_stays_authoritative_even_with_identical_bytes():
    # A UDF regression moves no bytes; on an idle host the wall flag must
    # not be suppressed by the byte comparison.
    rec = decide_flag(2.0, 1.0, 1.0, _M, dict(_M), idle=True)
    assert rec is not None and rec["reasons"] == ["wall"]


def test_loaded_host_wall_without_byte_budget_stays_authoritative():
    # Nothing to disprove it with -> keep the flag (degraded mode).
    rec = decide_flag(2.5, 1.0, 1.3, _M, None, idle=False)
    assert rec is not None and rec["reasons"] == ["wall"]


def test_loaded_host_byte_growth_plus_wall_flags_both():
    now = {"shuffle_read_bytes": 40_000_000, "input_bytes": 50_000_000}
    rec = decide_flag(2.5, 1.0, 1.3, now, dict(_M), idle=False)
    assert rec is not None
    assert set(rec["reasons"]) == {"shuffle_read_bytes", "wall"}


def _wall_flag(ratio=2.0, bytes_identical=True):
    return {"reasons": ["wall"], "bytes_identical": bytes_identical,
            "ratio_normalized": ratio}


def test_uniform_wall_inflation_demotes_to_regime_suspect():
    # Measured round-9 failure mode: 24/37 walls over budget on an "idle"
    # host with probe factor 1.04 and byte-identical metrics everywhere —
    # a latency regime the throughput probe can't see. Fleet-level rule:
    # that many simultaneous byte-identical wall flags = regime, demote.
    flags = {f"q{i}": _wall_flag() for i in range(24)}
    auth, demoted = demote_uniform_wall_flags(flags, n_checked=37)
    assert auth == {} and len(demoted) == 24
    assert all(r["reasons"] == ["wall_regime_suspect"] for r in demoted.values())


def test_targeted_wall_regression_stays_authoritative():
    flags = {"q1": _wall_flag(), "q2": _wall_flag()}
    auth, demoted = demote_uniform_wall_flags(flags, n_checked=37)
    assert set(auth) == {"q1", "q2"} and demoted == {}


def test_byte_moving_flags_never_demote():
    flags = {f"q{i}": _wall_flag() for i in range(10)}
    flags["plan_change"] = {
        "reasons": ["shuffle_read_bytes", "wall"], "bytes_identical": False,
    }
    flags["no_bytes_info"] = {"reasons": ["wall"], "bytes_identical": False}
    auth, demoted = demote_uniform_wall_flags(flags, n_checked=37)
    assert "plan_change" in auth and "no_bytes_info" in auth
    assert len(demoted) == 10


def test_missing_wall_budget_still_byte_checks():
    now = {"shuffle_read_bytes": 40_000_000, "input_bytes": 50_000_000}
    rec = decide_flag(0.5, None, 1.0, now, dict(_M))
    assert rec is not None and rec["reasons"] == ["shuffle_read_bytes"]


def test_subfloor_idle_wall_with_identical_bytes_demotes():
    # Round-9 residual mode, now pinned: ratchet-minimum budgets on
    # fixed-cost sub-half-second queries sit inside idle-host jitter
    # (both round-9 flags — 0.46s/0.35s walls, byte-identical 59 B
    # shuffles — were A/B-arbitrated to host variance). Raw wall under
    # the 0.5s floor + identical bytes + idle -> informational.
    rec = decide_flag(0.46, 0.29, 1.0, _M, dict(_M), idle=True)
    assert rec is not None
    assert rec["reasons"] == ["wall_smallfloor_suspect"]


def test_at_floor_idle_wall_stays_authoritative():
    # The floor is strict: a 0.5s+ raw wall is past fixed-cost jitter
    # territory and keeps the authoritative flag.
    rec = decide_flag(0.6, 0.3, 1.0, _M, dict(_M), idle=True)
    assert rec is not None and rec["reasons"] == ["wall"]


def test_subfloor_byte_growth_still_flags():
    # The floor only softens wall-only evidence; a sub-floor query whose
    # bytes grew is a plan change and flags regardless of wall size.
    now = {"shuffle_read_bytes": 40_000_000, "input_bytes": 50_000_000}
    rec = decide_flag(0.3, 0.1, 1.0, now, dict(_M), idle=True)
    assert rec is not None
    assert "shuffle_read_bytes" in rec["reasons"]
    assert "wall" in rec["reasons"]


def test_subfloor_without_byte_budget_stays_authoritative():
    # No byte evidence to disprove the wall with -> degraded mode keeps
    # the flag even under the floor.
    rec = decide_flag(0.4, 0.2, 1.0, _M, None, idle=True)
    assert rec is not None and rec["reasons"] == ["wall"]


arbitrate_wall_flags_by_retime = bench.arbitrate_wall_flags_by_retime


def _wall_rec(budget=1.0):
    return {"reasons": ["wall"], "bytes_identical": True, "budget": budget,
            "sec": 2.0}


def test_retime_under_budget_clears_the_flag():
    # The measured mode: two idle runs minutes apart, 20.2s vs 28.7s on
    # identical code — a fresh end-of-run measurement under budget proves
    # the plan still holds and demotes the wall flag.
    flags = {"q": _wall_rec(budget=1.0)}
    auth, cleared = arbitrate_wall_flags_by_retime(
        flags, lambda n: 0.9, threshold=1.5)
    assert auth == {} and list(cleared) == ["q"]
    assert cleared["q"]["reasons"] == ["wall_retime_cleared"]
    assert cleared["q"]["retime_sec"] == 0.9


def test_retime_still_over_budget_stays_authoritative():
    # A genuine regression reproduces in every minute: the flag stands,
    # with the confirming retime recorded.
    flags = {"q": _wall_rec(budget=1.0)}
    auth, cleared = arbitrate_wall_flags_by_retime(
        flags, lambda n: 1.8, threshold=1.5)
    assert list(auth) == ["q"] and cleared == {}
    assert auth["q"]["reasons"] == ["wall"]
    assert auth["q"]["retime_sec"] == 1.8


def test_retime_never_touches_byte_moving_flags():
    # Bytes are load-immune evidence; a plan change must not be retimed
    # away even by a fast minute.
    flags = {"q": {"reasons": ["shuffle_read_bytes", "wall"],
                   "bytes_identical": False, "budget": 1.0}}
    calls = []
    auth, cleared = arbitrate_wall_flags_by_retime(
        flags, lambda n: calls.append(n) or 0.1)
    assert list(auth) == ["q"] and cleared == {} and calls == []


def test_retime_cap_bounds_the_extra_wall_cost():
    flags = {f"q{i}": _wall_rec() for i in range(12)}
    calls = []
    auth, cleared = arbitrate_wall_flags_by_retime(
        flags, lambda n: calls.append(n) or 0.5, max_retimes=8)
    assert len(calls) == 8 and len(cleared) == 8 and len(auth) == 4


def test_retime_between_budget_and_threshold_is_borderline():
    # Round-10 split: a retime that lands in (budget, threshold*budget] is
    # neither a disproof (not under budget) nor a confirmation (the
    # over-threshold wall did not reproduce). It demotes out of the
    # authoritative set but keeps a distinct label so a recurring
    # borderline is visible run-over-run instead of vanishing into
    # "cleared".
    flags = {"q": _wall_rec(budget=1.0)}
    auth, demoted = arbitrate_wall_flags_by_retime(
        flags, lambda n: 1.3, threshold=1.5)
    assert auth == {} and list(demoted) == ["q"]
    assert demoted["q"]["reasons"] == ["wall_retime_borderline"]
    assert demoted["q"]["retime_sec"] == 1.3


def test_subfloor_gross_regression_stays_authoritative():
    # Round-10 escape hatch for the floor's documented blind spot: a
    # byte-neutral compute regression on a fixed-cost query (0.1s budget
    # -> 0.45s wall = 4.5x) is outside every observed jitter regime and
    # must flag even though the raw wall sits under the 0.5s floor.
    rec = decide_flag(0.45, 0.1, 1.0, _M, dict(_M), idle=True)
    assert rec is not None and rec["reasons"] == ["wall"]


def test_subfloor_under_gross_ratio_still_demotes():
    # ...while the ordinary jitter band (<3x) keeps the floor demotion.
    rec = decide_flag(0.45, 0.2, 1.0, _M, dict(_M), idle=True)
    assert rec is not None
    assert rec["reasons"] == ["wall_smallfloor_suspect"]


# ------------------------------------- zero-shuffle wall auto-arbitration
# Round-11 (verdict task 5): the r10 flag — dedup_minhash_signatures,
# 0.657s vs 0.427s budget, 0-byte shuffle, plan pinned, manually retimed to
# host regime — is now arbitrated by rule: budgeted shuffle under the byte
# jitter floor + bytes identical + idle demotes the wall regardless of the
# absolute floor, keeping the gross escape hatch and byte policing.

_ZS = {"shuffle_read_bytes": 0, "input_bytes": 5_000_000}


def test_zeroshuffle_overfloor_wall_demotes():
    # the exact r10 flag shape: 0.657s raw (over the 0.5s floor), 1.54x
    # budget, zero-shuffle budget, bytes identical, idle
    rec = decide_flag(0.657, 0.427, 1.0, dict(_ZS), dict(_ZS), idle=True)
    assert rec is not None
    assert rec["reasons"] == ["wall_zeroshuffle_suspect"]


def test_zeroshuffle_gross_regression_stays_authoritative():
    rec = decide_flag(1.5, 0.427, 1.0, dict(_ZS), dict(_ZS), idle=True)
    assert rec is not None and rec["reasons"] == ["wall"]


def test_zeroshuffle_input_byte_growth_still_flags():
    # zero-shuffle queries are still policed for plan changes through
    # their input-bytes budget (lost pushdown/pruning reads more)
    now = {"shuffle_read_bytes": 0, "input_bytes": 20_000_000}
    rec = decide_flag(0.657, 0.427, 1.0, now, dict(_ZS), idle=True)
    assert rec is not None
    assert "input_bytes" in rec["reasons"] and "wall" in rec["reasons"]


def test_zeroshuffle_class_is_budget_keyed_not_measurement_keyed():
    # the class membership comes from the BUDGET (the recorded plan), not
    # the current run: a query that newly grew a real shuffle cannot
    # self-demote by having had one in this run only
    now = {"shuffle_read_bytes": 10_000_000, "input_bytes": 5_000_000}
    rec = decide_flag(0.657, 0.427, 1.0, now, dict(_ZS), idle=True)
    assert rec is not None
    assert "shuffle_read_bytes" in rec["reasons"]  # byte growth flags
    assert "wall_zeroshuffle_suspect" not in rec["reasons"]


# ---------------------------------------------- epoch budget re-basing
update_budgets = bench.update_budgets

_MET = {"q": {"shuffle_read_bytes": 100, "input_bytes": 200, "n_stages": 3}}


def test_update_budgets_first_run_starts_epoch_one():
    bud = {"sf": 0.1, "budgets": {"q": 0.5}}  # legacy ratchet-minimum file
    assert update_budgets(bud, {"q": 1.2}, _MET, 1.0, idle=True)
    assert bud["epoch"] == 1
    # legacy golden-minute budget replaced by the fresh sample, not kept
    assert bud["budgets"]["q"] == 1.2
    assert bud["wall_samples"]["q"] == [1.2]
    assert bud["byte_budgets"]["q"]["shuffle_read_bytes"] == 100


def test_update_budgets_median_not_minimum():
    # The round-9 root cause: ratchet minima converge on golden minutes.
    # The epoch budget is the lower median of recent idle samples, so one
    # lucky 0.8s minute among typical 1.2s runs does NOT become the bar.
    bud = {"sf": 0.1, "budgets": {}, "epoch": 1,
           "wall_samples": {"q": [1.2, 0.8, 1.3]}}
    update_budgets(bud, {"q": 1.25}, {}, 1.0, idle=True)
    assert bud["wall_samples"]["q"] == [1.2, 0.8, 1.3, 1.25]
    assert bud["budgets"]["q"] == 1.2  # lower median of 4 samples


def test_update_budgets_sample_window_is_bounded():
    bud = {"sf": 0.1, "budgets": {}, "epoch": 1,
           "wall_samples": {"q": [1.0, 2.0, 3.0, 4.0, 5.0]}}
    update_budgets(bud, {"q": 6.0}, {}, 1.0, idle=True)
    assert bud["wall_samples"]["q"] == [2.0, 3.0, 4.0, 5.0, 6.0]
    assert bud["budgets"]["q"] == 4.0


def test_update_budgets_busy_host_cannot_loosen_the_bar():
    bud = {"sf": 0.1, "budgets": {"q": 1.0}, "epoch": 1,
           "wall_samples": {"q": [1.0]}}
    assert not update_budgets(bud, {"q": 9.0}, {}, 1.0, idle=False)
    assert bud["budgets"]["q"] == 1.0 and bud["wall_samples"]["q"] == [1.0]


def test_update_budgets_rebase_resets_history_and_bumps_epoch():
    bud = {"sf": 0.1, "budgets": {"q": 1.0}, "epoch": 3,
           "wall_samples": {"q": [1.0, 1.1]}}
    update_budgets(bud, {"q": 2.0}, {}, 1.0, idle=True, rebase=True)
    assert bud["epoch"] == 4
    assert bud["wall_samples"]["q"] == [2.0] and bud["budgets"]["q"] == 2.0


def test_update_budgets_normalizes_by_divisor():
    bud = {"sf": 0.1, "budgets": {}, "epoch": 1, "wall_samples": {}}
    update_budgets(bud, {"q": 2.0}, {}, 2.0, idle=True)
    assert bud["wall_samples"]["q"] == [1.0]


# ------------------------------------- scale-sweep linearity arbitration
def _load_scale_sweep():
    p = Path(__file__).resolve().parents[1] / "scripts" / "scale_sweep.py"
    spec = importlib.util.spec_from_file_location("scale_sweep_module", p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("scale_sweep_module", mod)
    spec.loader.exec_module(mod)
    return mod


classify_scaling = _load_scale_sweep().classify_scaling

_KB = {"wall": 0.3, "shuffle_write": 2048, "input_bytes": 3_000_000}


def test_scale_wall_only_noise_is_suspect_not_superlinear():
    # The round-9 artifact's failure mode: 14x wall on a kilobyte-shuffle
    # sub-second query whose bytes scale linearly. Without a surviving
    # retime this must NOT count as super-linear.
    lo = dict(_KB)
    hi = {"wall": 4.3, "shuffle_write": 20_480, "input_bytes": 30_000_000}
    cls = classify_scaling(lo, hi, data_ratio=10.0)
    assert cls["linear"] is True and cls.get("wall_suspect") is True


def test_scale_wall_cleared_by_retime():
    lo = dict(_KB)
    hi = {"wall": 4.3, "shuffle_write": 20_480, "input_bytes": 30_000_000}
    cls = classify_scaling(lo, hi, data_ratio=10.0, retime_wall=2.9)
    assert cls["linear"] is True and cls["wall_ratio"] <= 12.5
    assert cls["retime_wall"] == 2.9


def test_scale_wall_confirmed_by_retime_counts():
    lo = dict(_KB)
    hi = {"wall": 4.3, "shuffle_write": 20_480, "input_bytes": 30_000_000}
    cls = classify_scaling(lo, hi, data_ratio=10.0, retime_wall=4.2)
    assert cls["linear"] is False and cls["reasons"] == ["wall_confirmed"]


def test_scale_byte_growth_is_authoritative_without_retime():
    # A real shuffle (above floor at BOTH scales) growing 30x on 10x data
    # is the engine's fault — load-immune, flags immediately.
    lo = {"wall": 1.0, "shuffle_write": 1_000_000, "input_bytes": 10_000_000}
    hi = {"wall": 9.0, "shuffle_write": 30_000_000, "input_bytes": 100_000_000}
    cls = classify_scaling(lo, hi, data_ratio=10.0)
    assert cls["linear"] is False and "shuffle_write" in cls["reasons"]


def test_scale_aqe_broadcast_flip_is_informational():
    # broadcast at small SF (sub-floor shuffle) -> SMJ at large SF: a
    # legitimate planner regime change, recorded as byte_flip, not counted.
    lo = {"wall": 1.0, "shuffle_write": 423, "input_bytes": 10_000_000}
    hi = {"wall": 9.0, "shuffle_write": 11_500_000, "input_bytes": 100_000_000}
    cls = classify_scaling(lo, hi, data_ratio=10.0)
    assert cls["linear"] is True and cls["byte_flip"] == ["shuffle_write"]


def test_scale_subfloor_shuffles_never_flag_bytes():
    lo = {"wall": 0.3, "shuffle_write": 59, "input_bytes": 100}
    hi = {"wall": 0.9, "shuffle_write": 30_000, "input_bytes": 40_000}
    cls = classify_scaling(lo, hi, data_ratio=10.0)
    assert cls["linear"] is True and "byte_flip" not in cls


def test_scale_single_segment_step_is_informational():
    # The broadcast->SMJ staircase: joins against scaled tables lose
    # their broadcast somewhere in the range, so end-to-end growth looks
    # super-linear while one segment is linear. byte_step, not counted.
    lo = {"wall": 0.6, "shuffle_write": 300_000, "input_bytes": 3_000_000}
    mid = {"wall": 0.8, "shuffle_write": 950_000, "input_bytes": 9_000_000}
    hi = {"wall": 1.1, "shuffle_write": 65_000_000, "input_bytes": 30_000_000}
    cls = classify_scaling(
        lo, hi, data_ratio=10.0, mid_rec=mid, mid_data_ratio=3.0
    )
    assert cls["linear"] is True
    assert cls["byte_step"] == ["shuffle_write"]
    assert cls["shuffle_write_seg_ratios"][1] > 10


def test_scale_every_segment_super_stays_authoritative():
    # True quadratic pair expansion grows super-linearly in EVERY
    # segment — no staircase excuse.
    lo = {"wall": 1.0, "shuffle_write": 500_000, "input_bytes": 5_000_000}
    mid = {"wall": 4.0, "shuffle_write": 4_500_000, "input_bytes": 15_000_000}
    hi = {"wall": 30.0, "shuffle_write": 50_000_000, "input_bytes": 50_000_000}
    cls = classify_scaling(
        lo, hi, data_ratio=10.0, mid_rec=mid, mid_data_ratio=3.0
    )
    assert cls["linear"] is False and cls["reasons"] == ["shuffle_write"]


def test_scale_without_mid_record_keeps_single_span_rule():
    lo = {"wall": 1.0, "shuffle_write": 1_000_000, "input_bytes": 10_000_000}
    hi = {"wall": 9.0, "shuffle_write": 30_000_000, "input_bytes": 100_000_000}
    cls = classify_scaling(lo, hi, data_ratio=10.0)
    assert cls["linear"] is False and "shuffle_write" in cls["reasons"]


arbitrate_bytes_by_pinned_plan = _load_scale_sweep().arbitrate_bytes_by_pinned_plan


def test_pinned_plan_linear_records_clear_byte_flag():
    # Measured q17 case: default-config shuffle 95x (broadcast->SMJ flip)
    # but pinned-strategy RECORDS 12.7x on 10x data -> planner regime
    # change, cleared with the evidence recorded.
    cls = {"reasons": ["shuffle_write"], "linear": False}
    nb_lo = {"shuffle_write": 4_473_348, "shuffle_records": 620_763,
             "input_bytes": 1}
    nb_hi = {"shuffle_write": 77_768_289, "shuffle_records": 7_908_007,
             "input_bytes": 10}
    out = arbitrate_bytes_by_pinned_plan(cls, nb_lo, nb_hi, data_ratio=10.0)
    assert out["linear"] is True
    assert out["byte_flip_arbitrated"] == ["shuffle_write"]
    assert out["shuffle_write_pinned_basis"] == "records"
    assert out["shuffle_write_pinned_ratio"] == 12.74


def test_pinned_plan_super_records_stay_authoritative():
    # Measured media-phash case: pinned records 23x on 10x data — the
    # quadratic candidate class, no demotion.
    cls = {"reasons": ["shuffle_write"], "linear": False}
    nb_lo = {"shuffle_write": 2_310_599, "shuffle_records": 197_598}
    nb_hi = {"shuffle_write": 53_566_255, "shuffle_records": 4_572_212}
    out = arbitrate_bytes_by_pinned_plan(cls, nb_lo, nb_hi, data_ratio=10.0)
    assert out["linear"] is False and out["reasons"] == ["shuffle_write"]


def test_pinned_plan_falls_back_to_bytes_without_records():
    cls = {"reasons": ["input_bytes"], "linear": False}
    nb_lo = {"input_bytes": 1_000_000}
    nb_hi = {"input_bytes": 12_000_000}
    out = arbitrate_bytes_by_pinned_plan(cls, nb_lo, nb_hi, data_ratio=10.0)
    assert out["linear"] is True
    assert out["input_bytes_pinned_basis"] == "bytes"


def test_pinned_plan_output_growth_demotes_with_evidence():
    # Measured wide-phash case: the scaled corpus genuinely contains
    # super-linearly many near-dup pairs (result rows 54 -> 181,505 =
    # 3361x), and the engine moves only 27x records to produce them —
    # movement is carrying the answer, not wasted.
    cls = {"reasons": ["shuffle_write"], "linear": False}
    nb_lo = {"shuffle_write": 2_000_000, "shuffle_records": 170_000}
    nb_hi = {"shuffle_write": 55_000_000, "shuffle_records": 4_600_000}
    out = arbitrate_bytes_by_pinned_plan(
        cls, nb_lo, nb_hi, data_ratio=10.0, result_ratio=3361.2
    )
    assert out["linear"] is True
    assert out["output_cardinality_growth"] == ["shuffle_write"]
    assert out["result_ratio"] == 3361.2


def test_pinned_plan_quadratic_movement_for_linear_answer_still_flags():
    # Lost blocking: all-pairs volume for a linear-sized answer. The
    # result_ratio bound cannot excuse it.
    cls = {"reasons": ["shuffle_write"], "linear": False}
    nb_lo = {"shuffle_write": 1_000_000, "shuffle_records": 100_000}
    nb_hi = {"shuffle_write": 100_000_000, "shuffle_records": 10_000_000}
    out = arbitrate_bytes_by_pinned_plan(
        cls, nb_lo, nb_hi, data_ratio=10.0, result_ratio=9.8
    )
    assert out["linear"] is False and out["reasons"] == ["shuffle_write"]


def test_loaded_regime_reference_is_labeled_and_excluded():
    """Round-11 verdict task 6: the budgets file carries ONE explicit
    loaded-regime epoch — a builder-run bench under deliberate concurrent
    load — so wall-only arbitration can quote a MEASURED loaded/idle ratio
    for this host (r11 judge measured 27.8s loaded vs 19.9s idle = 1.4x;
    this reference records 1.55x) instead of re-deriving it each round.

    Arbitration note: when a bench wall exceeds budget but bytes are
    identical and the host was not idle-checked, compare the observed
    inflation against ``loaded_over_idle_ratio`` — an inflation at or
    under the recorded loaded/idle swing on this host is host regime, not
    code, and the retime/bytes arbitration (decide_flag) stays the
    authority. The reference itself must stay OUT of the thresholds:
    budgets and wall_samples are idle-gated (update_budgets returns False
    for idle=False), so the loaded walls may never appear there."""
    import json
    from pathlib import Path

    bud = json.loads(
        (Path(__file__).resolve().parent.parent / "bench_budgets.json")
        .read_text()
    )
    ref = bud["loaded_regime_reference"]
    assert ref["idle"] is False  # labeled as a loaded run
    assert "EXCLUDED" in ref["note"]
    assert ref["loaded_over_idle_ratio"] > 1.0
    assert ref["headline_total_sec"] > ref["idle_reference_total_sec"]
    # the loaded walls are a reference, not samples: every wall budget must
    # be strictly below its loaded counterpart's un-normalized wall for the
    # slowest queries (spot-check: none of the loaded walls ever entered
    # the idle-gated sample history verbatim)
    for name, loaded_wall in ref["walls"].items():
        samples = bud.get("wall_samples", {}).get(name, [])
        assert loaded_wall not in samples, (name, loaded_wall)
    # and the idle-gate that enforces the exclusion going forward
    from bench import update_budgets

    probe = {"budgets": dict(bud["budgets"]), "epoch": bud.get("epoch", 1),
             "wall_samples": {k: list(v) for k, v in
                              bud.get("wall_samples", {}).items()}}
    wrote = update_budgets(
        probe, ref["walls"], {}, divisor=1.0, idle=False
    )
    assert wrote is False
    assert probe["budgets"] == bud["budgets"]
