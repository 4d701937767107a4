"""Roofline accounting sanity: every bench-row model must audit.

The audit feeds BENCH_r*.json; a broken model dies silently inside
bench.py's try/except, so this guards the accounting itself.
"""
import math

from pytorch_hmm_tpu.roofline import BENCH_MODELS, V5E, audit


def test_every_model_audits():
    for name in BENCH_MODELS:
        out = audit(name, 1e-3)
        assert out is not None, name
        assert out["ceiling_ms"] > 0, name
        assert math.isfinite(out["frac_of_ceiling"]), name
        # frac at exactly the ceiling time must be ~1.0 (ceiling_ms is
        # rounded to 4 decimals, so small rows carry rounding error)
        at_ceiling = audit(name, out["ceiling_ms"] * 1e-3)
        assert abs(at_ceiling["frac_of_ceiling"] - 1.0) < 1e-2, name


def test_mfu_reported_on_mxu_rows():
    for name in (
        "bigk_forward_ll_b48_T2048_k512",
        "mixture_gaussian_full_cov_decode_rtf_b32_T1000_s12_c4_d80",
        "neural_hmm_forward_rtf_b16_T1000_s12_h256",
    ):
        assert "mfu_pct" in audit(name, 1e-3), name


def test_unknown_metric_returns_none():
    assert audit("not_a_row", 1e-3) is None


def test_measured_floor_constants_are_ordered():
    # The per-family measured floors must respect their structural
    # ordering: HIGHEST chain > DEFAULT chain; ring > plain decode
    # pair; beam floors grow with N.
    assert V5E["serial_step_hi"] > V5E["serial_step"]
    assert V5E["step_pair_hsmm_ring"] > V5E["step_pair_decode"]
    assert (V5E["step_pair_beam1"] < V5E["step_pair_beam8"]
            < V5E["step_pair_beam16"])
