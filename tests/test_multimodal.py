"""Multimodal plumbing: binary payload columns through actor-pool stages.

The codecs are deterministic fakes (container libs not available) — these
tests pin the REAL parts: schema in/out, actor batching, null/undecodable
handling, frame explosion layout."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from tenzir_ray.text.multimodal import (
    ImageDecoder,
    ImageFeatures,
    ImageResizer,
    decode_images,
    encode_fake_image,
    sample_video_frames,
)


def _image_ds(n=20):
    rows = [
        {"id": i, "image": encode_fake_image(16 + i, 8 + i, 3, seed=i)}
        for i in range(n)
    ]
    rows.append({"id": n, "image": None})
    rows.append({"id": n + 1, "image": b"\x89PNG..."})  # real format → stub skips
    return rd.from_items(rows)


def test_decode_images_pipeline():
    out = decode_images(_image_ds(), batch_size=8, concurrency=2).to_pandas()
    ok = out[out["img_ok"]]
    assert len(ok) == 20
    assert (ok["img_width"] == 16 + ok["id"]).all()
    assert (ok["img_height"] == 8 + ok["id"]).all()
    bad = out[~out["img_ok"]]
    assert len(bad) == 2 and bad["pixels"].isna().all()


def test_resize_and_features_chain():
    ds = decode_images(_image_ds(6), batch_size=4, concurrency=2)
    ds = ds.map_batches(ImageResizer, fn_constructor_kwargs={"out_w": 4, "out_h": 4},
                        batch_format="pyarrow", batch_size=4, concurrency=2)
    ds = ds.map_batches(ImageFeatures, batch_format="pyarrow", batch_size=4,
                        concurrency=2)
    out = ds.to_pandas()
    ok = out[out["img_ok"]]
    assert all(len(b) == 4 * 4 * 3 for b in ok["pixels_resized"])
    assert all(len(f) == 6 for f in ok["img_features"])  # mean+std per channel
    f = np.array(list(ok["img_features"].iloc[0]))
    assert ((f >= 0) & (f <= 1)).all()


def test_decoder_deterministic():
    d = ImageDecoder()
    t = pa.table({"image": [encode_fake_image(8, 8, 3, seed=1)] * 2})
    a, b = d(t), d(t)
    assert a.column("pixels").to_pylist() == b.column("pixels").to_pylist()


def test_video_frame_sampling():
    frame = encode_fake_image(4, 4, 1, seed=7)
    video = frame * 25  # 25 identical fake frames
    ds = rd.from_items([{"vid": 0, "video": video}, {"vid": 1, "video": None}])
    out = ds.map_batches(
        lambda t: sample_video_frames(t, payload_col="video", every_n=10),
        batch_format="pyarrow",
    ).to_pandas()
    assert list(out["frame_idx"]) == [0, 10, 20]
    assert (out["vid"] == 0).all()
    assert all(bytes(f)[:4] == b"FAKE" for f in out["frame"])


def test_real_codec_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        sample_video_frames(
            pa.table({"video": [b"\x00\x00\x00 ftypmp42..."]}), payload_col="video"
        )


def test_audio_features(ray_session):
    import numpy as np
    import ray.data as rd

    from tenzir_ray.text.multimodal import (
        AudioFeatures, encode_fake_audio, extract_audio_features,
    )

    rows = [{"aid": i, "audio": encode_fake_audio(16000 + i * 100, seed=i)}
            for i in range(20)]
    ds = rd.from_items(rows)
    out = extract_audio_features(ds, batch_size=8, concurrency=(1, 2))
    got = sorted(out.take_all(), key=lambda r: r["aid"])
    assert all(r["audio_ok"] for r in got)
    assert got[0]["sample_rate"] == 16000
    assert abs(got[0]["duration_s"] - 1.0) < 0.01
    assert 0.1 < got[0]["audio_rms"] < 0.5


def test_audio_real_codec_clearly_stubbed():
    import pyarrow as pa
    import pytest as _pt

    from tenzir_ray.text.multimodal import AudioFeatures

    t = pa.table({"audio": pa.array([b"RIFF....WAVE"], pa.binary())})
    with _pt.raises(NotImplementedError):
        AudioFeatures()(t)
