"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns alongside. Decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages: codec/model
setup happens once per actor in ``__init__`` (ST3 pattern), batches
stay SMALL (wide binary rows — SURVEY.md §7 hard part 6; pass
``batch_size=`` explicitly at call sites).

The decode libraries (Pillow/PyAV/torchaudio) are NOT in this
container, so the default codec step is STUBBED: ``backend="fake"``
derives deterministic per-item features from the payload bytes (real
Ray plumbing — schema, batching, actor lifecycle — with fake pixels).
The REAL backends are implemented behind import guards and
self-upgrade the moment the library exists in the environment:
``backend="pil"`` (ImageDecodeStage, Pillow) and ``backend="ffmpeg"``
(FrameSampleStage, PyAV) decode actual payloads into the SAME output
schema; constructing them without the library raises
``NotImplementedError`` from the original ImportError. Backend
selection is tested both ways (tests/test_multimodal.py: the
real-decode tests ``importorskip`` when the libs are absent). The
stage interface (input/output schema) is what downstream stages
compile against and is fully tested under the fake backend.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mapchete_xarray_ray.stages.arrowbuf import binary_offsets_and_data

IMAGE_FEATURE_DIM = 8


class ImageDecodeStage:
    """Actor-pool stage: ``(id, payload: binary)`` -> decoded metadata +
    feature vector.

    Output schema: id passthrough, ``width:int64, height:int64,
    feature: fixed_size_list<float64>[IMAGE_FEATURE_DIM]``.
    """

    def __init__(self, backend: str = "fake", target_size: int = 64,
                 id_col: str = "id", payload_col: str = "payload"):
        self._pil = None
        if backend == "pil":
            # import guard: the stage upgrades to a real decoder the
            # moment Pillow exists; until then the error names the
            # missing dependency instead of failing mid-batch
            try:
                from PIL import Image
            except ImportError as ex:
                raise NotImplementedError(
                    "image backend 'pil' requires Pillow, which is not "
                    "available in this environment; use backend='fake'"
                ) from ex
            self._pil = Image
        elif backend != "fake":
            raise NotImplementedError(
                f"image backend {backend!r} is not supported; "
                "use backend='fake' or backend='pil'"
            )
        self.backend = backend
        self.target_size = target_size
        self.id_col = id_col
        self.payload_col = payload_col
        # expensive setup (model load / codec init) happens HERE,
        # once per actor — not per batch.

    def _decode_fake(self, buf: bytes):
        """Deterministic pseudo-decode: byte-class-count dims +
        byte-histogram features. Pure function of the payload bytes,
        chosen from plain byte arithmetic so an oracle can reproduce it
        (the driver's SQL twin for image_features does). (Scalar
        reference for the vectorized batch path below.)"""
        arr = np.frombuffer(buf, dtype=np.uint8)
        width = 16 + (len(arr) % 256)
        if len(arr) == 0:
            return width, 16, np.zeros(IMAGE_FEATURE_DIM)
        hist = np.bincount(arr >> 5, minlength=IMAGE_FEATURE_DIM)[:IMAGE_FEATURE_DIM]
        height = 16 + (int(hist[1]) % 256)
        return width, height, hist / len(arr)

    def _decode_pil(self, buf: bytes):
        """Real decode: true dims from the container, features = the
        same 8-bucket brightness histogram as the fake path, but over
        the grayscale pixels of the ``target_size``-resized image.
        Undecodable/empty payloads yield (0, 0, zeros) rather than
        killing the batch."""
        from io import BytesIO

        try:
            img = self._pil.open(BytesIO(buf))
            width, height = img.size
            g = img.convert("L").resize((self.target_size, self.target_size))
        except Exception:
            return 0, 0, np.zeros(IMAGE_FEATURE_DIM)
        px = np.asarray(g, dtype=np.uint8).ravel()
        hist = np.bincount(px >> 5,
                           minlength=IMAGE_FEATURE_DIM)[:IMAGE_FEATURE_DIM]
        return int(width), int(height), hist / px.size

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._pil is not None:
            # codec calls are inherently per-item; parallelism comes
            # from the actor pool across batches, not within one
            out = [self._decode_pil(buf or b"")
                   for buf in batch.column(self.payload_col).to_pylist()]
            feats = (np.stack([f for _, _, f in out]) if out
                     else np.zeros((0, IMAGE_FEATURE_DIM)))
            return pa.table({
                self.id_col: batch.column(self.id_col),
                "width": pa.array([w for w, _, _ in out], pa.int64()),
                "height": pa.array([h for _, h, _ in out], pa.int64()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), IMAGE_FEATURE_DIM),
            })
        # vectorized over the batch: dims and histogram features come
        # from ONE concatenated-bytes pass with a segment bincount
        # (np.add.at on (row, bucket)), not a python loop body per
        # image
        # zero-copy: offsets + values straight from the Arrow binary
        # buffers (large-offset and sliced-array handling live in the
        # shared helper); nulls read as empty payloads
        offsets, raw, n = binary_offsets_and_data(
            batch.column(self.payload_col), name=self.payload_col)
        lens = np.diff(offsets)
        widths = (16 + (lens % 256)).astype(np.int64)
        all_bytes = raw[offsets[0]:offsets[-1]] if n else raw[:0]
        counts = np.zeros((n, IMAGE_FEATURE_DIM), dtype=np.int64)
        if all_bytes.size:
            row = np.repeat(np.arange(n), lens)
            np.add.at(counts, (row, all_bytes >> 5), 1)
        heights = (16 + (counts[:, 1] % 256)).astype(np.int64)
        feats = counts.astype(np.float64)
        nz = lens > 0
        feats[nz] /= lens[nz, None]
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1)), IMAGE_FEATURE_DIM)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "feature": feat_arr,
        })


class FrameSampleStage:
    """Actor-pool stage: ``(id, payload: binary, n_frames:int64)`` ->
    one row PER SAMPLED FRAME (flat_map shape): ``(id, frame_idx,
    frame_payload: binary)``. Sampling is deterministic: every
    ``stride``-th frame. The fake backend slices the payload bytes into
    equal frame segments."""

    def __init__(self, backend: str = "fake", stride: int = 2,
                 id_col: str = "id", payload_col: str = "payload"):
        self._av = None
        if backend == "ffmpeg":
            # import guard: upgrades to a real demux/decode (PyAV wraps
            # the ffmpeg libraries) the moment the dependency exists
            try:
                import av
            except ImportError as ex:
                raise NotImplementedError(
                    "video backend 'ffmpeg' requires PyAV, which is not "
                    "available in this environment; use backend='fake'"
                ) from ex
            self._av = av
        elif backend != "fake":
            raise NotImplementedError(
                f"video backend {backend!r} is not supported; "
                "use backend='fake' or backend='ffmpeg'"
            )
        self.backend = backend
        self.stride = stride
        self.id_col = id_col
        self.payload_col = payload_col

    def _frames_ffmpeg(self, buf: bytes):
        """Real demux+decode: every ``stride``-th decoded video frame
        as raw rgb24 bytes. ``n_frames`` is ignored — the container
        knows its own frame count. Undecodable payloads yield no
        frames (the row disappears, flat_map semantics)."""
        from io import BytesIO

        out = []
        try:
            with self._av.open(BytesIO(buf)) as container:
                for fi, frame in enumerate(container.decode(video=0)):
                    if fi % self.stride == 0:
                        out.append(
                            (fi, frame.to_ndarray(format="rgb24").tobytes()))
        except Exception:
            return []
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, frames = [], [], []
        ids = batch.column(self.id_col).to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        if self._av is not None:
            for i, buf in enumerate(payloads):
                for fi, fbuf in self._frames_ffmpeg(buf or b""):
                    ids_out.append(ids[i])
                    idx_out.append(fi)
                    frames.append(fbuf)
            return pa.table({
                self.id_col: pa.array(ids_out, pa.int64()),
                "frame_idx": pa.array(idx_out, pa.int64()),
                "frame_payload": pa.array(frames, pa.binary()),
            })
        nframes = batch.column("n_frames").to_pylist()
        for i, (buf, nf) in enumerate(zip(payloads, nframes)):
            buf = buf or b""
            nf = max(int(nf), 1)
            seg = max(len(buf) // nf, 1)
            for fi in range(0, nf, self.stride):
                ids_out.append(ids[i])
                idx_out.append(fi)
                frames.append(buf[fi * seg:(fi + 1) * seg])
        return pa.table({
            self.id_col: pa.array(ids_out, pa.int64()),
            "frame_idx": pa.array(idx_out, pa.int64()),
            "frame_payload": pa.array(frames, pa.binary()),
        })


AUDIO_WINDOW = 64  # samples per analysis window


class AudioFeatureStage:
    """Actor-pool stage: ``(id, payload: binary)`` -> windowed audio
    features. Unlike the image/video stages the decode here is REAL:
    ``backend="pcm16"`` interprets the payload as little-endian int16
    PCM (a trailing odd byte is ignored) — pure numpy, no codec
    library. Compressed backends (mp3/flac/ogg) would raise until the
    codec dependency exists, mirroring the image stage's contract.

    Output schema (all int64, so an exact SQL oracle can reproduce it
    byte-for-byte): ``n_samples``; ``n_zero_cross`` (count of
    consecutive sample pairs with a strict sign change);
    ``peak_window`` (index of the AUDIO_WINDOW-sample window with the
    largest energy = sum of squared samples, ties to the earliest
    window, -1 for empty payloads); ``peak_energy``.
    """

    def __init__(self, backend: str = "pcm16", id_col: str = "id",
                 payload_col: str = "payload"):
        if backend not in ("pcm16",):
            raise NotImplementedError(
                f"audio backend {backend!r} requires a codec library that "
                "is not available in this environment; use backend='pcm16'"
            )
        self.id_col = id_col
        self.payload_col = payload_col

    @staticmethod
    def _features_scalar(buf: bytes):
        """Per-item sequential reference (test oracle for the
        vectorized batch path)."""
        s = np.frombuffer(buf[:len(buf) - len(buf) % 2],
                          dtype="<i2").astype(np.int64)
        if len(s) == 0:
            return 0, 0, -1, 0
        zc = int(((s[1:] * s[:-1]) < 0).sum())
        n_win = (len(s) + AUDIO_WINDOW - 1) // AUDIO_WINDOW
        energies = [int((s[w * AUDIO_WINDOW:(w + 1) * AUDIO_WINDOW] ** 2)
                        .sum()) for w in range(n_win)]
        peak = int(np.argmax(energies))  # first max = earliest window
        return len(s), zc, peak, energies[peak]

    def __call__(self, batch: pa.Table) -> pa.Table:
        offsets, raw, n = binary_offsets_and_data(
            batch.column(self.payload_col), name=self.payload_col)
        lens = np.diff(offsets)
        ns = lens // 2
        total = int(ns.sum())
        n_zc = np.zeros(n, dtype=np.int64)
        peak_win = np.full(n, -1, dtype=np.int64)
        peak_en = np.zeros(n, dtype=np.int64)
        if total:
            doc = np.repeat(np.arange(n), ns)
            cum = np.concatenate(([0], np.cumsum(ns)))
            within = np.arange(total) - cum[doc]
            pos = offsets[:-1][doc] + 2 * within
            s = (raw[pos].astype(np.int64)
                 | (raw[pos + 1].astype(np.int64) << 8))
            s -= (s >= 32768) * np.int64(65536)
            same = doc[1:] == doc[:-1]
            cross = (s[1:] * s[:-1]) < 0
            hits = doc[:-1][same & cross]
            if len(hits):
                n_zc += np.bincount(hits, minlength=n)
            win = within // AUDIO_WINDOW
            seg = np.ones(total, dtype=bool)
            seg[1:] = (doc[1:] != doc[:-1]) | (win[1:] != win[:-1])
            starts = np.flatnonzero(seg)
            energy = np.add.reduceat(s * s, starts)
            seg_doc, seg_win = doc[starts], win[starts]
            order = np.lexsort((seg_win, -energy, seg_doc))
            sd = seg_doc[order]
            first = np.ones(len(sd), dtype=bool)
            first[1:] = sd[1:] != sd[:-1]
            peak_win[sd[first]] = seg_win[order][first]
            peak_en[sd[first]] = energy[order][first]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_samples": pa.array(ns.astype(np.int64), pa.int64()),
            "n_zero_cross": pa.array(n_zc, pa.int64()),
            "peak_window": pa.array(peak_win, pa.int64()),
            "peak_energy": pa.array(peak_en, pa.int64()),
        })
