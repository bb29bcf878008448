"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample staged
as Arrow-batched transforms.

The container has no image/audio libs (sandbox constraint), so the
codec boundary is explicit:
  * REAL and tested: the Spark-side plumbing — schemas, mapInPandas
    batch shapes, metadata extraction from a deterministic container
    header, partition-count preservation, null handling;
  * STUBBED: the actual pixel/sample decode (``decode_image`` raises
    NotImplementedError unless the deterministic fake codec is chosen).

Fake container format (self-describing, 16-byte header, used by the
synthesizer and tests):
    bytes 0-3   magic b'GSMM'
    byte  4     kind (1=image, 2=audio, 3=video)
    bytes 5-6   width  (uint16 LE)   [image/video]
    bytes 7-8   height (uint16 LE)
    bytes 9-12  n_frames or n_samples (uint32 LE)
    bytes 13-15 reserved
    payload     pseudo-random bytes (hashed from asset id)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MAGIC = b"GSMM"
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 1, 2, 3

META_SCHEMA = ("asset_id long, kind int, width int, height int, "
               "n_frames int, n_bytes long, valid boolean")


def make_asset(asset_id: int, kind: int, width: int = 0, height: int = 0,
               n_frames: int = 1, payload_len: int = 64) -> bytes:
    import hashlib
    h = hashlib.md5(f"asset{asset_id}".encode()).digest()
    payload = (h * (payload_len // 16 + 1))[:payload_len]
    hdr = (MAGIC + bytes([kind])
           + int(width).to_bytes(2, "little")
           + int(height).to_bytes(2, "little")
           + int(n_frames).to_bytes(4, "little") + b"\x00" * 3)
    return hdr + payload


def parse_meta_batch(assets: pd.Series) -> pd.DataFrame:
    """Vectorized header parse over a binary Series (the plumbing that
    is real: one pyarrow buffer pass, no per-row Python parsing)."""
    import pyarrow as pa
    arr = pa.array(assets, type=pa.binary())
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32,
                            count=len(arr) + 1).astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    n = len(arr)
    lens = np.diff(offsets)
    validity = ~np.asarray(arr.is_null()) if arr.null_count else \
        np.ones(n, dtype=bool)
    ok = validity & (lens >= 16)
    st = offsets[:-1]
    kind = np.zeros(n, dtype=np.int32)
    width = np.zeros(n, dtype=np.int32)
    height = np.zeros(n, dtype=np.int32)
    nfr = np.zeros(n, dtype=np.int32)
    idx = np.nonzero(ok)[0]
    if idx.size:
        s = st[idx]
        magic_ok = ((data[s] == MAGIC[0]) & (data[s + 1] == MAGIC[1])
                    & (data[s + 2] == MAGIC[2]) & (data[s + 3] == MAGIC[3]))
        idx = idx[magic_ok]
        s = s[magic_ok]
        kind[idx] = data[s + 4]
        width[idx] = data[s + 5] | (data[s + 6].astype(np.int32) << 8)
        height[idx] = data[s + 7] | (data[s + 8].astype(np.int32) << 8)
        nfr[idx] = (data[s + 9]
                    | (data[s + 10].astype(np.int32) << 8)
                    | (data[s + 11].astype(np.int32) << 16)
                    | (data[s + 12].astype(np.int32) << 24))
        ok = np.zeros(n, dtype=bool)
        ok[idx] = True
    return pd.DataFrame({"kind": kind, "width": width, "height": height,
                         "n_frames": nfr, "n_bytes": lens.astype(np.int64),
                         "valid": ok})


def decode_image(asset: bytes, *, allow_fake: bool = False) -> np.ndarray:
    """STUB: real image decode needs PIL/libjpeg (absent). The fake
    codec hashes the payload into a deterministic (h, w) uint8 array so
    downstream feature plumbing is testable."""
    if not allow_fake:
        raise NotImplementedError(
            "image decode requires an image library not present in this "
            "container; pass allow_fake=True for the deterministic stub")
    meta = parse_meta_batch(pd.Series([asset])).iloc[0]
    if not meta.valid or meta.kind != KIND_IMAGE:
        raise ValueError("not a GSMM image asset")
    rng = np.frombuffer(asset[16:], dtype=np.uint8)
    h, w = int(meta.height), int(meta.width)
    reps = (h * w) // max(len(rng), 1) + 1
    return np.tile(rng, reps)[:h * w].reshape(h, w)


def with_asset_meta(df, asset_col: str = "asset", id_col: str = "asset_id"):
    """DataFrame(asset binary) -> + typed metadata columns, via
    mapInPandas (Arrow batches; schema fixed)."""
    def fn(it):
        for pdf in it:
            meta = parse_meta_batch(pdf[asset_col])
            out = pd.DataFrame({
                "asset_id": pdf[id_col].to_numpy(),
                "kind": meta["kind"], "width": meta["width"],
                "height": meta["height"], "n_frames": meta["n_frames"],
                "n_bytes": meta["n_bytes"], "valid": meta["valid"]})
            yield out
    return df.mapInPandas(fn, schema=META_SCHEMA)


def byte_histogram_features(df, asset_col: str = "asset",
                            id_col: str = "asset_id", n_bins: int = 16):
    """Feature extraction plumbing: payload byte histogram (the
    stand-in for real embeddings) -> (asset_id, features array<double>).
    Batch shape: one np.bincount per row over a buffer slice — the same
    access pattern a real decoder would use."""
    schema = f"{id_col} long, features array<double>"

    def fn(it):
        for pdf in it:
            ids, feats = [], []
            for aid, b in zip(pdf[id_col], pdf[asset_col]):
                if b is None or len(b) <= 16:
                    continue
                arr = np.frombuffer(b, dtype=np.uint8, offset=16)
                hist = np.bincount(arr >> 4, minlength=n_bins) \
                    .astype(np.float64)
                tot = hist.sum()
                feats.append((hist / tot if tot else hist).tolist())
                ids.append(aid)
            yield pd.DataFrame({id_col: ids, "features": feats})
    return df.mapInPandas(fn, schema=schema)


def frame_sample(df, every_k: int = 2, asset_col: str = "asset",
                 id_col: str = "asset_id"):
    """Video frame-sampling plumbing: emit one row per sampled frame
    index (decode itself stubbed — frame payload is the deterministic
    slice a real demuxer would hand over)."""
    schema = f"{id_col} long, frame_idx int, frame_bytes binary"

    def fn(it):
        for pdf in it:
            meta = parse_meta_batch(pdf[asset_col])
            rows_id, rows_fi, rows_fb = [], [], []
            for j in range(len(pdf)):
                if not meta["valid"].iloc[j] or \
                        meta["kind"].iloc[j] != KIND_VIDEO:
                    continue
                b = pdf[asset_col].iloc[j]
                nf = int(meta["n_frames"].iloc[j])
                payload = b[16:]
                if not payload:
                    continue
                fl = max(len(payload) // max(nf, 1), 1)
                for fi in range(0, nf, every_k):
                    rows_id.append(pdf[id_col].iloc[j])
                    rows_fi.append(fi)
                    rows_fb.append(bytes(payload[fi * fl:(fi + 1) * fl]))
            yield pd.DataFrame({id_col: rows_id, "frame_idx": rows_fi,
                                "frame_bytes": rows_fb})
    return df.mapInPandas(fn, schema=schema)


def synth_assets_df(spark, n: int, seed_kinds=(1, 2, 3)):
    """Deterministic multimodal asset table (id -> kind/dims hashed)."""
    rows = []
    for i in range(n):
        kind = seed_kinds[i % len(seed_kinds)]
        w, h = 4 + (i * 7) % 60, 4 + (i * 13) % 40
        nf = 1 if kind == KIND_IMAGE else 4 + i % 9
        rows.append((i, make_asset(i, kind, w, h, nf,
                                   payload_len=32 + (i % 5) * 16)))
    return spark.createDataFrame(rows, "asset_id long, asset binary")
