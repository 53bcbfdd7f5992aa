"""Round-6: multimodal resize / spectral / frame-sample queries.

Each new registered query is recomputed independently here in pure
numpy/python directly from the fixture blobs (no Spark code paths), so the
rows-only driver check is backed by a value-level pin.
"""

from __future__ import annotations

import numpy as np

from pyvectorsearch_spark.operators.multimodal import (
    _decode_pcm,
    _decode_rgb,
    _media_rows,
)


def test_image_resize_query_matches_numpy(spark):
    from pyvectorsearch_spark.queries.multimodal_extra import (
        q_multimodal_image_resize,
    )

    got = {r.n_px: r for r in q_multimodal_image_resize(spark, "").collect()}
    # independent recompute from the raw fixture rows
    rows = [r for r in _media_rows(96, 7) if r[1] == "image"]
    means = []
    for _mid, _kind, blob, _meta in rows:
        px = np.asarray(_decode_rgb(bytes(blob), 8, 8)).reshape(-1, 3)
        means.append(px.mean(axis=0))
    means = np.asarray(means)
    assert list(got) == [8 * 8 * 3]
    row = got[192]
    assert row.n_images == len(rows) == 32
    for i, col in enumerate(["avg_r", "avg_g", "avg_b"]):
        assert abs(getattr(row, col) - round(float(means[:, i].mean()), 6)) < 1e-6


def test_audio_spectrum_query_matches_numpy(spark):
    from pyvectorsearch_spark.queries.multimodal_extra import (
        q_multimodal_audio_spectrum,
    )

    [row] = q_multimodal_audio_spectrum(spark, "").collect()
    rows = [r for r in _media_rows(96, 7) if r[1] == "audio"]
    cents, flats, energies, doms = [], [], [], []
    for _mid, _kind, blob, _meta in rows:
        x = np.asarray(_decode_pcm(bytes(blob), 1024))
        p = np.abs(np.fft.rfft(x))[1:] ** 2
        bins = np.arange(1, len(p) + 1, dtype=np.float64)
        doms.append(int(np.argmax(p)) + 1)
        cents.append(float((bins * p).sum() / p.sum()))
        eps = 1e-12
        flats.append(float(np.exp(np.mean(np.log(p + eps))) / (p.mean() + eps)))
        energies.append(float(np.mean(x * x)))
    assert row.n_audio == len(rows) == 32
    assert row.distinct_dom_bins == len(set(doms))
    assert abs(row.avg_centroid - round(float(np.mean(cents)), 6)) < 1e-6
    assert abs(row.avg_flatness - round(float(np.mean(flats)), 6)) < 1e-6
    assert abs(row.avg_energy - round(float(np.mean(energies)), 6)) < 1e-6
    # white-noise fixture: per-bin power is ~exponential, so spectral
    # flatness concentrates at exp(-gamma) ~= 0.561 (geo/arith mean of an
    # exponential), and the centroid sits near mid-spectrum (~256 of 512)
    assert 0.50 < row.avg_flatness < 0.63
    assert 200 < row.avg_centroid < 320


def test_video_framesample_query_matches_arithmetic(spark):
    from pyvectorsearch_spark.queries.multimodal_extra import (
        q_multimodal_video_framesample,
    )

    got = {r.n_sampled: (r.n_videos, r.max_frame_idx)
           for r in q_multimodal_video_framesample(spark, "").collect()}
    rows = [r for r in _media_rows(96, 7) if r[1] == "video"]
    want: dict[int, list] = {}
    for _mid, _kind, _blob, meta in rows:
        nf = meta["n_frames"]
        sampled = list(range(0, nf, 4))
        want.setdefault(len(sampled), []).append(max(sampled))
    assert got == {k: (len(v), max(v)) for k, v in want.items()}
    assert sum(v[0] for v in got.values()) == 32
