"""Multimodal stage plumbing (schema, batching, actor lifecycle) with
the deterministic fake decode backend."""

import numpy as np
import pyarrow as pa
import pytest
import ray
from mapchete_xarray_ray.collect import arrow_block_refs

from mapchete_xarray_ray.stages.multimodal import (
    IMAGE_FEATURE_DIM,
    FrameSampleStage,
    ImageDecodeStage,
)


def _payloads(n=20, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "id": pa.array(range(n), pa.int64()),
        "payload": pa.array([rng.bytes(64 + i) for i in range(n)], pa.binary()),
        "n_frames": pa.array([4 + i % 5 for i in range(n)], pa.int64()),
    })


def test_image_decode_schema_and_determinism():
    tbl = _payloads()
    ds = ray.data.from_arrow(tbl).map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs=dict(backend="fake"),
        batch_format="pyarrow",
        batch_size=8,          # wide binary rows -> small batches
        concurrency=2,
    )
    out = pa.concat_tables([ray.get(r) for r in arrow_block_refs(ds)])
    assert out.num_rows == 20
    assert out.schema.field("feature").type == pa.list_(pa.float64(), IMAGE_FEATURE_DIM)
    # deterministic: same payload -> same feature regardless of batching
    direct = ImageDecodeStage(backend="fake")(tbl.slice(5, 1))
    row = out.filter(pa.compute.equal(out.column("id"), 5))
    assert row.column("feature").to_pylist() == direct.column("feature").to_pylist()
    assert row.column("width").to_pylist() == direct.column("width").to_pylist()


def test_unknown_backend_raises():
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(backend="nope")
    with pytest.raises(NotImplementedError):
        FrameSampleStage(backend="webm")


def test_real_backends_guarded_when_libs_absent():
    """backend='pil'/'ffmpeg' must fail at CONSTRUCTION with a clear
    dependency message when the decode library is missing — never
    mid-batch. Skipped where the libraries exist (the upgrade tests
    below take over)."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            ImageDecodeStage(backend="pil")
    try:
        import av  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="PyAV"):
            FrameSampleStage(backend="ffmpeg")


def test_pil_backend_decodes_real_png():
    """Self-upgrading backend: runs only where Pillow exists (skips in
    environments without it)."""
    Image = pytest.importorskip("PIL.Image")
    from io import BytesIO

    img = Image.new("L", (20, 10), color=200)
    buf = BytesIO()
    img.save(buf, format="PNG")
    stage = ImageDecodeStage(backend="pil", target_size=8)
    out = stage(pa.table({"id": pa.array([1], pa.int64()),
                          "payload": pa.array([buf.getvalue()], pa.binary())}))
    assert out.column("width").to_pylist() == [20]
    assert out.column("height").to_pylist() == [10]
    feats = np.array(out.column("feature").to_pylist()[0])
    assert feats.sum() == pytest.approx(1.0)  # histogram normalized
    assert feats[200 >> 5] == pytest.approx(1.0)  # constant image


def test_ffmpeg_backend_decodes_real_video():
    """Self-upgrading backend: runs only where PyAV exists."""
    av = pytest.importorskip("av")
    from io import BytesIO

    raw = BytesIO()
    with av.open(raw, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=5)
        stream.width, stream.height = 16, 16
        stream.pix_fmt = "yuv420p"
        for i in range(6):
            frame = av.VideoFrame.from_ndarray(
                np.full((16, 16, 3), i * 40, dtype=np.uint8), format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    stage = FrameSampleStage(backend="ffmpeg", stride=2)
    out = stage(pa.table({
        "id": pa.array([7], pa.int64()),
        "payload": pa.array([raw.getvalue()], pa.binary()),
        "n_frames": pa.array([6], pa.int64())}))
    assert out.column("frame_idx").to_pylist() == [0, 2, 4]
    assert all(len(b) == 16 * 16 * 3
               for b in out.column("frame_payload").to_pylist())


def test_frame_sampling_flatmap_shape():
    tbl = _payloads(n=6)
    out = FrameSampleStage(backend="fake", stride=2)(tbl)
    # every item emits ceil(n_frames / 2) frames
    import math

    expected = sum(math.ceil(nf / 2) for nf in tbl.column("n_frames").to_pylist())
    assert out.num_rows == expected
    assert set(out.column_names) == {"id", "frame_idx", "frame_payload"}
    # frames are non-overlapping slices of the payload
    first = out.filter(pa.compute.equal(out.column("id"), 0))
    assert first.column("frame_idx").to_pylist() == [0, 2]


def test_vectorized_decode_matches_scalar_reference():
    """The batched histogram/crc path must equal the per-item scalar
    decode exactly (incl. empty payloads)."""
    import random

    import numpy as np
    import numpy.testing as npt
    import pyarrow as pa

    from mapchete_xarray_ray.stages.multimodal import ImageDecodeStage

    random.seed(3)
    payloads = [bytes(random.getrandbits(8) for _ in range(
        random.randint(0, 400))) for _ in range(200)] + [b""]
    t = pa.table({"id": pa.array(range(len(payloads)), pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    st = ImageDecodeStage(backend="fake")
    out = st(t)
    ws, hs, fs = zip(*(st._decode_fake(b) for b in payloads))
    npt.assert_array_equal(out.column("width").to_numpy(), np.array(ws))
    npt.assert_array_equal(out.column("height").to_numpy(), np.array(hs))
    got = np.asarray(out.column("feature").combine_chunks()
                     .values.to_numpy()).reshape(len(payloads), -1)
    npt.assert_array_equal(got, np.stack(fs))


def test_image_decode_large_binary_offsets():
    """large_binary payloads (int64 offsets) must decode identically to
    binary ones; non-binary payload columns fail loud."""
    import pytest

    payloads = [b"abc", b"", bytes(range(256)), b"z" * 999]
    ids = pa.array(range(len(payloads)), pa.int64())
    small = ImageDecodeStage(backend="fake")(pa.table({
        "id": ids, "payload": pa.array(payloads, pa.binary())}))
    big = ImageDecodeStage(backend="fake")(pa.table({
        "id": ids, "payload": pa.array(payloads, pa.large_binary())}))
    assert small.column("width").to_pylist() == big.column("width").to_pylist()
    assert (small.column("feature").to_pylist()
            == big.column("feature").to_pylist())
    with pytest.raises(TypeError, match="binary"):
        ImageDecodeStage(backend="fake")(pa.table({
            "id": ids, "payload": pa.array(["a", "b", "c", "d"])}))


def test_audio_feature_large_binary_and_sliced_offsets():
    """large_binary payloads (int64 offsets) and SLICED arrays must
    produce identical audio features to plain binary ones — same
    guarantee the image stage has, now via the shared buffer helper."""
    import pytest

    from mapchete_xarray_ray.stages.multimodal import AudioFeatureStage

    payloads = [b"\x01\x02" * 40, b"", bytes(range(256)), b"\x7f\xff" * 333]
    ids = pa.array(range(len(payloads)), pa.int64())
    stage = AudioFeatureStage(backend="pcm16")
    small = stage(pa.table({
        "id": ids, "payload": pa.array(payloads, pa.binary())}))
    big = stage(pa.table({
        "id": ids, "payload": pa.array(payloads, pa.large_binary())}))
    assert small.equals(big)
    sliced = stage(pa.table({
        "id": ids, "payload": pa.array(
            [b"SKIP", b"ME"] + payloads, pa.binary()).slice(2)}))
    assert small.equals(sliced)
    with pytest.raises(TypeError, match="binary"):
        stage(pa.table({"id": ids,
                        "payload": pa.array(["a", "b", "c", "d"])}))


def test_audio_feature_stage_vectorized_equals_scalar():
    """The batch PCM16 decode + windowed features equal the per-item
    sequential reference, including empty, odd-length, and
    sign-boundary payloads."""
    import numpy as np

    from mapchete_xarray_ray.stages.multimodal import (
        AUDIO_WINDOW,
        AudioFeatureStage,
    )

    rng = np.random.default_rng(23)
    payloads = [
        b"",                       # no samples
        b"\x01",                   # odd byte only -> no samples
        b"\x00\x80",               # single sample -32768
        b"\xff\x7f\x00\x80",       # +32767 then -32768: one crossing
        bytes(rng.integers(0, 256, 2 * AUDIO_WINDOW + 3).astype(np.uint8)),
        bytes(rng.integers(0, 256, 10 * AUDIO_WINDOW).astype(np.uint8)),
        b"\x00\x00" * 100,         # silence: zc=0, peak window 0
    ]
    ids = list(range(len(payloads)))
    batch = pa.table({"id": pa.array(ids, pa.int64()),
                      "payload": pa.array(payloads, pa.binary())})
    stage = AudioFeatureStage(backend="pcm16")
    out = stage(batch)
    for i, buf in enumerate(payloads):
        want = stage._features_scalar(buf)
        got = (out.column("n_samples")[i].as_py(),
               out.column("n_zero_cross")[i].as_py(),
               out.column("peak_window")[i].as_py(),
               out.column("peak_energy")[i].as_py())
        if want[0] == 0:
            assert got == (0, 0, -1, 0), (i, got)
        else:
            assert got == want, (i, got, want)
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(backend="mp3")
