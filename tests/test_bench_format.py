"""The recorded bench scoreboard must be machine-parseable.

Rounds 2 and 3 both recorded `parsed: null` because bench.py's single stdout line
(headline + embedded roofline dict) exceeded the driver's ~2000-char tail window,
truncating the front of the JSON. bench.build_records now splits output into a
compact scoreboard line (printed LAST) and a detail file; these tests pin the
compact line under bench.COMPACT_LINE_MAX with the FULL variant grid, so the
regression cannot silently recur.
"""

import json

import bench


def _full_grid():
    """Every variant tag the bench can produce, worst-case (longest) names."""
    tags = [
        "xla_fp32_factored_noguard",
        "xla_bf16_state_factored_final",
        "xla_bf16_state_factored_final_bf16mm",
        "train_fwd_bwd_factored",
        "train_fwd_bwd_bf16_state",
        "train_fwd_bwd_bf16_state_maskedk",
        "train_fwd_bwd_noremat",
        "train_fwd_bwd_bf16mm",
        "gnn_train_P64",
        "ghyp1c_train_P64",
        "ref_shape_P8_noguard",
        "ref_shape_P8_pallas_resident",
        "classic_P5_color_sweep",
        "xla_fp32_noguard",
        "xla_fp32",
        "xla_fp32_factored",
        "xla_bf16_state_factored",
        "xla_bf16",
        "pallas_fp32",
        "pallas_resident_bf16",
    ]
    # worst-case magnitudes: 6-digit iter/s with 2 decimals
    return {t: (123456.78, 0.003375) for t in tags}


def test_compact_line_fits_tail_window():
    record, detail = bench.build_records(_full_grid(), 0.1088, "measured_this_run")
    line = json.dumps(record)
    assert len(line) <= bench.COMPACT_LINE_MAX, len(line)
    # and with margin: the driver window is ~2000 chars and may prepend content
    assert len(line) <= 1400, len(line)
    assert "variants_trimmed" not in record  # full grid fits untrimmed


def test_compact_record_carries_the_scoreboard_fields():
    record, detail = bench.build_records(_full_grid(), 0.1088, "measured_this_run")
    assert record["metric"] == "dadmm_iter_per_sec_per_chip"
    assert record["value"] == 123456.78
    assert record["unit"] == "iter/s"
    assert record["vs_baseline"] > 1e5
    assert record["baseline_source"] == "measured_this_run"
    # every variant — including train_*/classic/ref_shape — is on the scoreboard
    assert set(record["variants_iter_per_sec"]) == set(_full_grid())
    # rooflines live in the detail record, NOT the compact line
    assert "rooflines" not in record
    assert "rooflines" in detail
    # round-trip: json -> parse -> same headline
    parsed = json.loads(json.dumps(record))
    assert parsed["value"] == record["value"]


def test_headline_excludes_train_ref_classic():
    grid = _full_grid()
    # make a train variant the fastest overall; headline must ignore it
    grid["train_fwd_bwd_factored"] = (999999.99, 0.001)
    record, _ = bench.build_records(grid, 0.1088, "measured_this_run")
    assert record["value"] == 123456.78
    # same for the GNN training tiers (different shape/units than the headline fwd)
    grid["train_fwd_bwd_factored"] = (123456.78, 0.003375)
    grid["ghyp1c_train_P64"] = (999999.99, 0.001)
    record, _ = bench.build_records(grid, 0.1088, "measured_this_run")
    assert record["value"] == 123456.78


def test_rooflines_skip_gnn_and_classic():
    _, detail = bench.build_records(_full_grid(), 0.1088, "measured_this_run")
    assert "gnn_train_P64" not in detail["rooflines"]
    assert "ghyp1c_train_P64" not in detail["rooflines"]
    assert "classic_P5_color_sweep" not in detail["rooflines"]
    assert "train_fwd_bwd_factored" in detail["rooflines"]


def test_all_dropped_reports_honest_zero():
    record, _ = bench.build_records(
        {"train_fwd_bwd_factored": (100.0, 0.1)}, 0.1088, "measured_this_run")
    assert record["value"] == 0.0
    assert "error" in record


def test_fallback_baseline_is_labelled():
    record, detail = bench.build_records(_full_grid(), 0.0522,
                                         "fallback_round1_constant")
    assert record["baseline_source"] == "fallback_round1_constant"
    assert detail["baseline_source"] == "fallback_round1_constant"
