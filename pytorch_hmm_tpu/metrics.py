"""Speech synthesis / alignment quality metrics.

Parity target: reference ``metrics.py`` — 11 metric functions plus the
comprehensive-evaluation orchestrator and print/save helpers. All are
pure jnp math (vectorized; the reference's per-batch and per-frame
Python loops, e.g. ``metrics.py:118-127`` and ``metrics.py:181-188``,
become masked reductions).
"""

from __future__ import annotations

import json
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "mel_cepstral_distortion",
    "f0_root_mean_square_error",
    "log_f0_rmse",
    "alignment_accuracy",
    "boundary_accuracy",
    "duration_accuracy",
    "spectral_distortion",
    "perceptual_evaluation_speech_quality",
    "comprehensive_speech_evaluation",
    "print_evaluation_summary",
    "save_evaluation_results",
]

_EPS = 1e-8


def _batched2(a, b):
    if a.ndim == 2:
        return a[None], b[None], True
    return a, b, False


def _trim(a, b, axis=1):
    n = min(a.shape[axis], b.shape[axis])
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(0, n)
    return a[tuple(sl)], b[tuple(sl)]


def mel_cepstral_distortion(
    mfcc_true: jax.Array,
    mfcc_pred: jax.Array,
    exclude_c0: bool = True,
) -> jax.Array:
    """MCD in dB: ``K·√(Σ_d (c_true − c_pred)²)`` time-averaged, with
    ``K = √2·10/ln 10 ≈ 6.14`` and c0 excluded by default
    (``metrics.py:21-69``)."""
    mfcc_true, mfcc_pred, squeeze = _batched2(
        jnp.asarray(mfcc_true), jnp.asarray(mfcc_pred)
    )
    if exclude_c0:
        mfcc_true = mfcc_true[:, :, 1:]
        mfcc_pred = mfcc_pred[:, :, 1:]
    mfcc_true, mfcc_pred = _trim(mfcc_true, mfcc_pred)
    sq = jnp.sum((mfcc_true - mfcc_pred) ** 2, axis=-1)
    K = math.sqrt(2.0) * 10.0 / math.log(10.0)
    mcd = jnp.mean(K * jnp.sqrt(sq + 1e-12), axis=1)
    return mcd[0] if squeeze else mcd


def f0_root_mean_square_error(
    f0_true: jax.Array,
    f0_pred: jax.Array,
    voiced_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """F0 RMSE in Hz over voiced frames (``metrics.py:72-133``).
    ``voiced_mask=None`` → frames where both F0s are positive."""
    f0_true, f0_pred = jnp.asarray(f0_true), jnp.asarray(f0_pred)
    squeeze = f0_true.ndim == 1
    if squeeze:
        f0_true, f0_pred = f0_true[None], f0_pred[None]
    f0_true, f0_pred = _trim(f0_true, f0_pred)
    if voiced_mask is None:
        mask = (f0_true > 0) & (f0_pred > 0)
    else:
        mask = jnp.asarray(voiced_mask)
        if mask.ndim == 1:
            mask = mask[None]
        mask = mask[:, : f0_true.shape[1]].astype(bool)
    sq = (f0_true - f0_pred) ** 2 * mask
    n = jnp.sum(mask, axis=1)
    rmse = jnp.where(
        n > 0, jnp.sqrt(jnp.sum(sq, axis=1) / jnp.maximum(n, 1)), 0.0
    )
    return rmse[0] if squeeze else rmse


def log_f0_rmse(
    f0_true: jax.Array,
    f0_pred: jax.Array,
    voiced_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """RMSE of log-F0 (perceptual pitch scale, ``metrics.py:136-157``)."""
    return f0_root_mean_square_error(
        jnp.log(jnp.asarray(f0_true) + _EPS),
        jnp.log(jnp.asarray(f0_pred) + _EPS),
        voiced_mask,
    )


def alignment_accuracy(
    predicted_alignment: jax.Array,
    ground_truth_alignment: jax.Array,
    tolerance: int = 0,
) -> jax.Array:
    """Frame-level alignment accuracy; with ``tolerance`` a frame counts
    when its label appears within ±tolerance frames of the ground truth
    (``metrics.py:160-195``)."""
    pred = jnp.asarray(predicted_alignment)
    gt = jnp.asarray(ground_truth_alignment)
    n = min(pred.shape[0], gt.shape[0])
    pred, gt = pred[:n], gt[:n]
    if tolerance == 0:
        return jnp.mean((pred == gt).astype(jnp.float32))
    # Window view: compare pred[i] against gt[i-tol : i+tol+1].
    offsets = jnp.arange(-tolerance, tolerance + 1)
    idx = jnp.clip(jnp.arange(n)[:, None] + offsets[None, :], 0, n - 1)
    hit = jnp.any(gt[idx] == pred[:, None], axis=1)
    return jnp.mean(hit.astype(jnp.float32))


def boundary_accuracy(
    predicted_boundaries: jax.Array,
    ground_truth_boundaries: jax.Array,
    tolerance: int = 2,
) -> Dict[str, jax.Array]:
    """Boundary precision/recall/F1 within a frame tolerance
    (``metrics.py:198-239``)."""
    pred = jnp.asarray(predicted_boundaries)
    gt = jnp.asarray(ground_truth_boundaries)
    dists = jnp.abs(pred[:, None] - gt[None, :])  # (P, G)
    matched_gt = jnp.any(dists <= tolerance, axis=0)    # recall side
    matched_pred = jnp.any(dists <= tolerance, axis=1)  # precision side
    tp = jnp.sum(matched_gt)
    # Precision counts unmatched predictions; deriving fp from the raw
    # prediction count (as the reference does, metrics.py:214-222) goes
    # negative when one prediction matches several references.
    fp = pred.shape[0] - jnp.sum(matched_pred)
    fn = gt.shape[0] - tp
    n_matched_pred = jnp.sum(matched_pred)
    precision = jnp.where(
        pred.shape[0] > 0, n_matched_pred / max(pred.shape[0], 1), 0.0
    )
    recall = jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1), 0.0)
    f1 = jnp.where(
        precision + recall > 0,
        2 * precision * recall / jnp.maximum(precision + recall, _EPS),
        0.0,
    )
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "true_positives": tp,
        "false_positives": fp,
        "false_negatives": fn,
    }


def duration_accuracy(
    predicted_durations: jax.Array,
    ground_truth_durations: jax.Array,
    relative_tolerance: float = 0.2,
) -> Dict[str, jax.Array]:
    """Duration MAE/RMSE/relative error/within-tolerance/correlation
    (``metrics.py:242-291``)."""
    pred = jnp.asarray(predicted_durations, jnp.float32)
    gt = jnp.asarray(ground_truth_durations, jnp.float32)
    n = min(pred.shape[0], gt.shape[0])
    pred, gt = pred[:n], gt[:n]
    abs_err = jnp.abs(pred - gt)
    rel_err = abs_err / (gt + _EPS)
    pred_c = pred - jnp.mean(pred)
    gt_c = gt - jnp.mean(gt)
    corr = jnp.sum(pred_c * gt_c) / (
        jnp.sqrt(jnp.sum(pred_c**2)) * jnp.sqrt(jnp.sum(gt_c**2)) + _EPS
    )
    return {
        "mae": jnp.mean(abs_err),
        "rmse": jnp.sqrt(jnp.mean((pred - gt) ** 2)),
        "mean_relative_error": jnp.mean(rel_err),
        "accuracy_within_tolerance": jnp.mean(
            (rel_err <= relative_tolerance).astype(jnp.float32)
        ),
        "correlation": corr,
    }


def spectral_distortion(
    spec_true: jax.Array,
    spec_pred: jax.Array,
    distance_type: str = "euclidean",
) -> jax.Array:
    """Spectral feature distortion — euclidean / cosine / KL
    (``metrics.py:294-349``)."""
    spec_true, spec_pred, squeeze = _batched2(
        jnp.asarray(spec_true), jnp.asarray(spec_pred)
    )
    spec_true, spec_pred = _trim(spec_true, spec_pred)

    if distance_type == "euclidean":
        d = jnp.sqrt(jnp.sum((spec_true - spec_pred) ** 2, axis=-1) + 1e-12)
        out = jnp.mean(d, axis=1)
    elif distance_type == "cosine":
        tn = spec_true / (
            jnp.linalg.norm(spec_true, axis=-1, keepdims=True) + _EPS
        )
        pn = spec_pred / (
            jnp.linalg.norm(spec_pred, axis=-1, keepdims=True) + _EPS
        )
        out = 1.0 - jnp.mean(jnp.sum(tn * pn, axis=-1), axis=1)
    elif distance_type == "kl_divergence":
        p = jax.nn.softmax(spec_true, axis=-1)
        q = jax.nn.softmax(spec_pred, axis=-1)
        kl = jnp.sum(p * jnp.log(p / (q + _EPS) + _EPS), axis=-1)
        out = jnp.mean(kl, axis=1)
    else:
        raise ValueError(f"Unknown distance_type: {distance_type}")
    return out[0] if squeeze else out


def _stft_mag(audio: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Magnitude STFT matching ``torch.stft`` defaults (rectangular
    window, centered reflect padding). Returns ``(freq, time)``."""
    pad = n_fft // 2
    x = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[idx]  # (time, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec).T


def perceptual_evaluation_speech_quality(
    clean_audio: jax.Array,
    degraded_audio: jax.Array,
    sample_rate: int = 16000,
) -> jax.Array:
    """Pseudo-PESQ: STFT log-magnitude MSE mapped onto the 1-5 MOS range
    (``metrics.py:352-401`` — an approximation there too)."""
    n_fft = int(0.025 * sample_rate)
    hop = int(0.010 * sample_rate)
    clean = _stft_mag(jnp.asarray(clean_audio), n_fft, hop)
    degraded = _stft_mag(jnp.asarray(degraded_audio), n_fft, hop)
    n = min(clean.shape[-1], degraded.shape[-1])
    mse = jnp.mean(
        (jnp.log(degraded[..., :n] + _EPS) - jnp.log(clean[..., :n] + _EPS))
        ** 2
    )
    return jnp.clip(jnp.exp(-mse) * 4.0 + 1.0, 1.0, 5.0)


def comprehensive_speech_evaluation(
    predicted_features: Dict[str, jax.Array],
    ground_truth_features: Dict[str, jax.Array],
    evaluation_config: Optional[Dict] = None,
) -> Dict[str, jax.Array]:
    """Run every applicable metric over a feature dict
    (``metrics.py:404-493``)."""
    cfg = {
        "mcd_exclude_c0": True,
        "f0_tolerance": 2,
        "alignment_tolerance": 0,
        "boundary_tolerance": 2,
        "duration_relative_tolerance": 0.2,
    }
    if evaluation_config:
        cfg.update(evaluation_config)

    metrics: Dict[str, jax.Array] = {}
    p, g = predicted_features, ground_truth_features

    if "mfcc" in p and "mfcc" in g:
        metrics["mcd"] = mel_cepstral_distortion(
            g["mfcc"], p["mfcc"], exclude_c0=cfg["mcd_exclude_c0"]
        )
    if "f0" in p and "f0" in g:
        vm = g.get("voiced_mask")
        metrics["f0_rmse"] = f0_root_mean_square_error(g["f0"], p["f0"], vm)
        metrics["log_f0_rmse"] = log_f0_rmse(g["f0"], p["f0"], vm)
    if "alignment" in p and "alignment" in g:
        metrics["alignment_accuracy"] = alignment_accuracy(
            p["alignment"], g["alignment"],
            tolerance=cfg["alignment_tolerance"],
        )
    if "boundaries" in p and "boundaries" in g:
        bm = boundary_accuracy(
            p["boundaries"], g["boundaries"],
            tolerance=cfg["boundary_tolerance"],
        )
        metrics.update({f"boundary_{k}": v for k, v in bm.items()})
    if "durations" in p and "durations" in g:
        dm = duration_accuracy(
            p["durations"], g["durations"],
            relative_tolerance=cfg["duration_relative_tolerance"],
        )
        metrics.update({f"duration_{k}": v for k, v in dm.items()})
    if "mel_spectrogram" in p and "mel_spectrogram" in g:
        metrics["spectral_distortion"] = spectral_distortion(
            g["mel_spectrogram"], p["mel_spectrogram"]
        )
    return metrics


def print_evaluation_summary(metrics: Dict[str, jax.Array]):
    """(``metrics.py:497-512``)."""
    print("=" * 50)
    print("Speech Synthesis Evaluation Summary")
    print("=" * 50)
    for name, value in metrics.items():
        arr = np.asarray(value)
        if arr.size == 1:
            print(f"{name:25s}: {float(arr):.4f}")
        else:
            print(f"{name:25s}: {arr.mean():.4f} (±{arr.std():.4f})")
    print("=" * 50)


def save_evaluation_results(metrics: Dict[str, jax.Array], save_path: str):
    """JSON-serialize a metrics dict (``metrics.py:515-531``)."""
    serializable = {
        k: np.asarray(v).tolist() for k, v in metrics.items()
    }
    with open(save_path, "w") as f:
        json.dump(serializable, f, indent=2)
    print(f"Evaluation results saved to {save_path}")
