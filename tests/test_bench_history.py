"""bench.py's noise guard reads per-round BENCH_r*.json history; a
round whose result line outgrew the driver's tail capture stores
``"parsed": null`` (it happened in round 4 and silently hid every r4
best-ever from the r5 guard — VERDICT r4 wrong#1). Lock the recovery
path: _load_bench_record must re-parse the truncated tail, and
_best_bench_value must see values from both parsed and tail-only
records at the matching scale factor."""

from __future__ import annotations

import json

import bench


def test_load_bench_record_parsed(tmp_path):
    rec = {"parsed": {"sf": 0.1, "queries": {"q01": 1.5}}, "tail": "ignored"}
    p = tmp_path / "BENCH_r01.json"
    p.write_text(json.dumps(rec))
    out = bench._load_bench_record(str(p))
    assert out["queries"]["q01"] == 1.5


def test_load_bench_record_recovers_truncated_tail(tmp_path):
    # The r4 shape: head of the result line lost, queries dict + sf
    # survive mid-string, then unrelated prose to EOF.
    tail = (
        ' "queries": {"q01": 0.783, "tera_10gb_pipeline": 25.009}, '
        '"sf": 0.1, "hsph_at_sf": {"10gb": 63.5}, "tera_disk_calibration": prose...'
    )
    rec = {"parsed": None, "tail": tail}
    p = tmp_path / "BENCH_r04.json"
    p.write_text(json.dumps(rec))
    out = bench._load_bench_record(str(p))
    assert out["sf"] == 0.1
    assert out["queries"]["tera_10gb_pipeline"] == 25.009


def test_best_bench_value_sees_real_r4_history():
    """Against the repo's actual recorded rounds: the r4 tail-only
    record contributes its best-evers (tera_10gb 25.009 was recorded
    ONLY in the truncated r4 file, so this fails if the fallback
    regresses)."""
    v = bench._best_bench_value("tera_10gb_pipeline", 0.1)
    assert v is not None and v <= 25.009


def test_load_bench_record_handles_garbage(tmp_path):
    p = tmp_path / "BENCH_rX.json"
    p.write_text("not json at all")
    assert bench._load_bench_record(str(p)) == {}


def test_sidecar_merges_best_of_round(tmp_path):
    """The same-round sidecar keeps per-query minima / HSph maxima
    across runs and labels the merge (co-tenant noise must not
    overwrite a better demonstrated number with a worse one)."""
    import json

    prev = {
        "metric": "headline_queries_elapsed",
        "value": 50.0,
        "unit": "sec",
        "queries": {"q01": 1.0, "tera_10gb_pipeline": 43.0},
        "sf": 0.1,
        "hsph_at_sf": {"10gb": 25.8},
    }
    payload = {
        "metric": "headline_queries_elapsed",
        "value": 70.0,
        "unit": "sec",
        "queries": {"q01": 0.9, "tera_10gb_pipeline": 61.0, "q_new": 2.0},
        "sf": 0.1,
        "hsph_at_sf": {"10gb": 20.0},
        "deltas_vs_prev": {},
    }
    merged = bench._merge_sidecar(prev, payload)
    assert merged["queries"] == {"q01": 0.9, "tera_10gb_pipeline": 43.0, "q_new": 2.0}
    assert merged["hsph_at_sf"] == {"10gb": 25.8}
    assert merged["merged_best_of_round"] is True
    assert merged["value"] == round(sum(merged["queries"].values()), 3)
    # a strictly-better run passes through unlabeled
    best = dict(payload, queries={"q01": 0.5, "tera_10gb_pipeline": 40.0}, hsph_at_sf={"10gb": 30.0})
    same_sf_prev = {"sf": 0.1, "queries": {"q01": 1.0, "tera_10gb_pipeline": 43.0}, "hsph_at_sf": {"10gb": 25.8}}
    assert bench._merge_sidecar(same_sf_prev, best) is best
    # a run at a DIFFERENT scale factor must never clobber the round's
    # record for the original scale — the existing sidecar is kept
    other_sf = dict(best, sf=1.0)
    assert bench._merge_sidecar(same_sf_prev, other_sf) is same_sf_prev
