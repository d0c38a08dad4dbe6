"""Debug visualizer, analysis tools, profiling utilities."""

import json
import os

import numpy as np

from repurpose_tpu.utils.analysis import (
    feature_label_analysis,
    lag_analysis,
    modality_correlation,
    render_projection,
)
from repurpose_tpu.utils.debug_viz import ValidationDebugger
from repurpose_tpu.utils.profiling import StepTimer


def _sample(rng, t=120, collapse=False):
    probs = rng.uniform(0, 1, t)
    offsets = np.zeros((t, 2)) if collapse else rng.uniform(0, 30, (t, 2))
    gt_labels = (rng.uniform(size=t) > 0.7).astype(float)
    gt_offsets = rng.uniform(0, 30, (t, 2))
    return probs, offsets, gt_labels, gt_offsets


def test_debugger_renders_and_logs(tmp_path, rng):
    dbg = ValidationDebugger(str(tmp_path), tag="t")
    p, o, gl, go = _sample(rng)
    dbg.add_sample("vid1", p, o, gl, go,
                   pred_segments=np.array([[10.0, 40.0]]),
                   gt_segments=[[12.0, 38.0]], loss=1.5)
    paths = dbg.render()
    assert len(paths) == 1 and os.path.exists(paths[0])
    log_path = dbg.write_log()
    summary = json.load(open(log_path))
    assert summary["n_samples"] == 1
    assert summary["loss"]["mean"] == 1.5
    assert summary["collapse_warnings"] == []


def test_debugger_collapse_warning(tmp_path, rng):
    dbg = ValidationDebugger(str(tmp_path), tag="t")
    p, o, gl, go = _sample(rng, collapse=True)
    dbg.add_sample("flat", p, o, gl, go)
    warnings = dbg.check_model_collapse()
    assert len(warnings) == 1 and "flat" in warnings[0]


def test_feature_label_analysis_separable(tmp_path, rng):
    t, d = 200, 16
    labels = (rng.uniform(size=t) > 0.5).astype(int)
    feats = rng.normal(0, 1, (t, d))
    feats[:, 0] += labels * 3.0  # dim 0 is highly informative
    out = feature_label_analysis(feats, labels)
    assert out["separability_acc"] > 0.8
    assert 0 in out["top_correlated_dims"][:3]
    img = render_projection(out, labels, str(tmp_path / "proj.png"))
    assert os.path.exists(img)


def test_modality_correlation_aligned_beats_shifted(rng):
    t = 300
    base = rng.normal(0, 1, t).cumsum()  # smooth shared signal
    vis = base[:, None] * rng.uniform(0.5, 1, 8)[None] + rng.normal(0, 0.1, (t, 8))
    aud = base[:, None] * rng.uniform(0.5, 1, 4)[None] + rng.normal(0, 0.1, (t, 4))
    labels = (base > np.median(base)).astype(int)
    out = modality_correlation({"visual": vis, "audio": aud}, labels)
    pair = out["pairs"]["audio/visual"]
    assert pair["aligned_beats_shifted"]
    assert "highlight_separation" in out


def test_lag_analysis_detects_shift(rng):
    t = 400
    sig = np.abs(rng.normal(0, 1, t + 5).cumsum())
    a = sig[5:, None] * np.ones(3)
    b = sig[:-5, None] * np.ones(3)  # b lags a by 5
    out = lag_analysis(a, b, max_lag=8)
    assert out["best_lag"] == -5
    assert out["best_corr"] > 0.9


def test_step_timer():
    timer = StepTimer(window=4)
    for _ in range(5):
        timer.tick()
    assert timer.mean >= 0 and timer.p50 >= 0
    assert set(timer.summary()) == {"step_time_mean_s", "step_time_p50_s"}


def test_clip_export(tmp_path):
    from repurpose_tpu.utils.export import (
        ffmpeg_cut_commands,
        results_to_manifest,
        write_manifest,
    )

    results = [
        {
            "video_id": "vidA",
            "segments": np.array([[-2.0, 30.0], [100.0, 160.0]]),
            "scores": np.array([0.6, 0.9]),
            "labels": np.array([5, 120]),
            "duration": 150,
        }
    ]
    clips = results_to_manifest(results, min_score=0.5)
    assert [c["rank"] for c in clips] == [0, 1]
    assert clips[0]["score"] == 0.9
    assert clips[0]["start"] == 100.0 and clips[0]["end"] == 150.0  # clamped
    assert clips[1]["start"] == 0.0  # negative start clamped
    path = str(tmp_path / "clips.json")
    write_manifest(results, path)
    assert json.load(open(path))
    cmds = ffmpeg_cut_commands(clips, "videos", "out")
    assert len(cmds) == 2 and "vidA_r00.mp4" in cmds[0] and "-c copy" in cmds[0]


# -- reference-parity per-dimension analyses (round 2) --------------------------


def _correlated_streams(rng, t=200, shift=0):
    """Three streams sharing a latent signal in their first dims; ``shift``
    delays the audio/text copies."""
    latent = rng.normal(0, 1, t + abs(shift))
    mk = lambda d: rng.normal(0, 0.3, (t, d))
    vis, aud, txt = mk(16), mk(24), mk(8)
    vis[:, :4] += latent[:t, None]
    aud[:, :4] += latent[shift : t + shift, None]
    txt[:, :2] += latent[shift : t + shift, None]
    return {"visual": vis, "audio": aud, "text": txt}


def test_dimension_correlation_pearson_and_spearman(rng):
    from repurpose_tpu.utils.analysis import dimension_correlation

    s = _correlated_streams(rng)
    for method in ("pearson", "spearman"):
        corr = dimension_correlation(s["visual"], s["audio"], method=method)
        noise = dimension_correlation(
            rng.normal(0, 1, (200, 16)), rng.normal(0, 1, (200, 24)), method=method
        )
        assert corr["mean_abs_corr"] > noise["mean_abs_corr"]
        assert corr["significant_frac"] > noise["significant_frac"]
        assert corr["n_pairs"] == 100  # first 10x10 dims (reference cap)


def test_temporal_correlation_peaks_at_zero(rng):
    from repurpose_tpu.utils.analysis import temporal_correlation

    res = temporal_correlation(_correlated_streams(rng), max_offset=5)
    assert res["offsets"] == list(range(-5, 6))
    assert all(res["peak_at_zero"].values()), res["peak_at_zero"]


def test_temporal_correlation_detects_shift(rng):
    from repurpose_tpu.utils.analysis import temporal_correlation

    res = temporal_correlation(_correlated_streams(rng, shift=3), max_offset=5)
    va = res["pairs"]["visual_audio"]
    best = res["offsets"][int(np.argmax(va))]
    assert abs(best) == 3  # latent delayed by 3s shows up in the offset sweep
    assert not res["peak_at_zero"]["visual_audio"]


def test_highlight_background_correlation(rng):
    from repurpose_tpu.utils.analysis import highlight_background_correlation

    t = 240
    labels = np.zeros(t)
    labels[40:120] = 1  # 80 highlight seconds
    latent = rng.normal(0, 1, t)
    s = {
        "visual": rng.normal(0, 0.3, (t, 16)),
        "audio": rng.normal(0, 0.3, (t, 24)),
        "text": rng.normal(0, 0.3, (t, 8)),
    }
    hl = labels.astype(bool)  # correlate only inside highlights
    for k, d in (("visual", 4), ("audio", 4), ("text", 2)):
        s[k][hl, :d] += latent[hl, None]
    res = highlight_background_correlation(s, labels)
    assert set(res) == {"highlight", "background"}
    for pair in res["highlight"]:
        assert res["highlight"][pair] > res["background"][pair]


def test_label_cross_correlation_peak(rng):
    from repurpose_tpu.utils.analysis import label_cross_correlation

    t = 300
    labels = (rng.uniform(size=t) < 0.3).astype(int)
    s = {
        "visual": rng.normal(0, 1, (t, 16)) + 2.0 * labels[:, None],
        "audio": rng.normal(0, 1, (t, 24)),
        "text": rng.normal(0, 1, (t, 8)),
    }
    res = label_cross_correlation(s, labels, max_lag=20)
    assert res["visual"]["peak_lag"] == 0
    assert res["visual"]["peak_correlation"] > 0.5
    assert res["visual"]["lr_score"] > 0.8
    assert res["combined"]["peak_lag"] == 0
    # too few positives -> None (reference guard, :236-237)
    assert label_cross_correlation(s, np.zeros(t, int)) is None


def test_feature_label_analysis_tsne(rng):
    from repurpose_tpu.utils.analysis import feature_label_analysis

    x = rng.normal(0, 1, (80, 12))
    labels = (rng.uniform(size=80) < 0.4).astype(int)
    x[labels == 1, :3] += 2.0
    res = feature_label_analysis(x, labels, method="tsne")
    assert res["projection"].shape == (80, 3)
    assert res["method"] == "tsne"
    # umap not installed in this image: must fall back to PCA, not raise
    res2 = feature_label_analysis(x, labels, method="umap")
    assert res2["projection"].shape[0] == 80


def test_write_report_artifact(tmp_path, rng):
    from repurpose_tpu.utils.analysis import (
        highlight_background_correlation,
        label_cross_correlation,
        temporal_correlation,
        write_report,
    )

    s = _correlated_streams(rng)
    labels = (rng.uniform(size=200) < 0.3).astype(int)
    all_results = {
        "vid0": {
            "temporal": temporal_correlation(s, max_offset=3),
            "highlight_background": highlight_background_correlation(s, labels),
            "label_regression": label_cross_correlation(s, labels),
        }
    }
    path = write_report(all_results, str(tmp_path / "report.txt"))
    text = open(path).read()
    for section in (
        "MODALITY CORRELATION ANALYSIS REPORT",
        "TEMPORAL CORRELATION",
        "HIGHLIGHT VS BACKGROUND",
        "LABEL CROSS-CORRELATION",
        "ASSESSMENT",
    ):
        assert section in text
    assert "visual_audio" in text
