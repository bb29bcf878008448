"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample staged
as Arrow-batched transforms.

The container has no image/audio libs (sandbox constraint), so the
codec boundary is explicit:
  * REAL and tested: the Spark-side plumbing (schemas, mapInPandas
    batch shapes, header metadata, null handling) AND the lib-free
    codecs — 24-bit BMP, 8-bit PNG (stdlib zlib inflate + NumPy
    scanline unfiltering, all five filter types) and PCM16 WAV
    (``decode_bmp``/``decode_png``/``decode_wav``), with feature
    extraction over the decoded pixels/samples
    (``image_features``/``audio_features``);
  * STUBBED: formats that genuinely need codec libraries (JPEG, MP3,
    H.264) — ``decode_image`` raises NotImplementedError for them
    unless the deterministic fake codec is chosen.

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
    """Image decode. REAL for BMP (24-bit uncompressed) and PNG
    (8-bit, stdlib zlib + NumPy unfilter — see decode_png); JPEG still
    needs a codec library absent from this container. The GSMM fake
    codec remains for plumbing tests."""
    if asset[:2] == b"BM":
        return decode_bmp(asset)
    if asset[:8] == PNG_SIG:
        return decode_png(asset)
    if not allow_fake:
        raise NotImplementedError(
            "only BMP and PNG decode without an image library in this "
            "container; pass allow_fake=True for the deterministic stub")
    meta = parse_meta_batch(pd.Series([asset])).iloc[0]
    if not meta.valid or meta.kind != KIND_IMAGE:
        raise ValueError("not a GSMM image asset")
    rng = np.frombuffer(asset[16:], dtype=np.uint8)
    h, w = int(meta.height), int(meta.width)
    reps = (h * w) // max(len(rng), 1) + 1
    return np.tile(rng, reps)[:h * w].reshape(h, w)


# ---------------------------------------------------------------------------
# real lib-free codecs: BMP (24-bit) and WAV (PCM16)
# ---------------------------------------------------------------------------

def make_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BMP bytes (BITMAPINFO-
    HEADER, rows padded to 4 bytes) — the standard uncompressed layout."""
    import struct
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_len = (w * 3 + 3) & ~3
    img = np.zeros((h, row_len), dtype=np.uint8)
    bgr = px[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    img[:, :w * 3] = bgr.reshape(h, w * 3)
    data = img.tobytes()
    off = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(data), 2835, 2835, 0, 0))
    return hdr + data


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB. Pure NumPy: one
    frombuffer + strided reshape; handles bottom-up and top-down rows
    and 4-byte row padding."""
    import struct
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", b, 10)[0]
    hsz, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp, comp = struct.unpack_from("<HHI", b, 26)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP "
                                  f"(got bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    raw = np.frombuffer(b, dtype=np.uint8, count=h * row_len, offset=off)
    rows = raw.reshape(h, row_len)[:, :w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def make_png(pixels: np.ndarray) -> bytes:
    """(h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA uint8 -> PNG bytes
    (8-bit, filter 0 per scanline, no interlace). stdlib zlib only."""
    import struct
    import zlib
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = np.zeros((h, 1 + w * c), dtype=np.uint8)
    raw[:, 1:] = px.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), 6)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(b: bytes) -> np.ndarray:
    """PNG -> (h, w, channels) uint8. Lib-free: stdlib zlib inflate +
    NumPy per-scanline unfiltering (all five filter types; Sub/Up are
    fully vectorized, Average/Paeth walk pixels only on rows that use
    them). 8-bit depth, no interlace — the shapes a data pipeline
    writes itself; JPEG remains the genuine library boundary."""
    import struct
    import zlib
    if b[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        tag = b[pos + 4:pos + 8]
        body = b[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or ctype not in _PNG_CHANNELS:
        raise ValueError("bad PNG header")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG (depth={depth}, "
            f"interlace={interlace})")
    c = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * c
    if raw.size != h * stride:
        raise ValueError("PNG scanline size mismatch")
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    out = np.zeros((h, w * c), dtype=np.uint8)
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        row = raw[y, 1:].copy()
        f = filters[y]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: wrap-add accumulate per channel column
            rec = np.add.accumulate(
                row.reshape(w, c), axis=0, dtype=np.uint8).reshape(-1)
        elif f == 2:  # Up
            rec = row + prev
        elif f == 3:  # Average
            rec = row
            for i in range(w * c):
                a = int(rec[i - c]) if i >= c else 0
                rec[i] = (int(row[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = row
            for i in range(w * c):
                a = int(rec[i - c]) if i >= c else 0
                cc = int(prev[i - c]) if i >= c else 0
                rec[i] = (int(row[i]) + _paeth(a, int(prev[i]), cc)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, c)
    return px[:, :, 0] if c == 1 else px


def make_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes."""
    import struct
    s = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(s))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(s)) + s)


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono -> (int16 samples, sample_rate). Walks the
    chunk list (fmt /data may be preceded by LIST etc.)."""
    import struct
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or ch != 1 or bits != 16:
                raise NotImplementedError("only PCM16 mono WAV")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, rate


def decode_audio(asset: bytes) -> tuple[np.ndarray, int]:
    """Audio decode: REAL for WAV PCM16; other containers need libs."""
    if asset[:4] == b"RIFF":
        return decode_wav(asset)
    raise NotImplementedError(
        "only WAV decodes without an audio library in this container")


def image_features(df, asset_col: str = "asset",
                   id_col: str = "asset_id"):
    """Feature extraction over REAL decoded pixels (BMP + PNG paths):
    per-image mean/std/luma-histogram(8) -> (asset_id, features
    array<double>). mapInPandas batches; undecodable rows are skipped
    (the coverage drop is visible as missing ids, never wrong
    values)."""
    schema = f"{id_col} long, features array<double>"

    def fn(it):
        for pdf in it:
            ids, feats = [], []
            for aid, b in zip(pdf[id_col], pdf[asset_col]):
                if b is None:
                    continue
                hb = bytes(b[:8])
                if hb[:2] == b"BM":
                    px = decode_bmp(bytes(b)).astype(np.float64)
                elif hb == PNG_SIG:
                    px = decode_png(bytes(b)).astype(np.float64)
                    if px.ndim == 2:
                        px = px[:, :, None]
                    px = px[:, :, :3]
                else:
                    continue
                luma = px.mean(axis=2)
                hist = np.histogram(luma, bins=8, range=(0, 256))[0]
                tot = hist.sum()
                feats.append([float(px.mean()), float(px.std())]
                             + (hist / (tot if tot else 1)).tolist())
                ids.append(aid)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "features": pd.Series(feats, dtype="object")})
    return df.mapInPandas(fn, schema=schema)


def audio_features(df, asset_col: str = "asset",
                   id_col: str = "asset_id"):
    """Per-clip features over REAL decoded samples (WAV path): duration,
    RMS, zero-crossing rate."""
    schema = (f"{id_col} long, duration_s double, rms double, "
              f"zcr double")

    def fn(it):
        for pdf in it:
            rows = []
            for aid, b in zip(pdf[id_col], pdf[asset_col]):
                if b is None or bytes(b[:4]) != b"RIFF":
                    continue
                s, rate = decode_wav(bytes(b))
                x = s.astype(np.float64) / 32768.0
                zc = float(np.mean(np.abs(np.diff(np.sign(x))) > 0)) \
                    if len(x) > 1 else 0.0
                rows.append((aid, len(x) / rate,
                             float(np.sqrt(np.mean(x * x)))
                             if len(x) else 0.0, zc))
            yield pd.DataFrame(rows, columns=[id_col, "duration_s",
                                              "rms", "zcr"]) \
                if rows else pd.DataFrame(
                    {id_col: pd.Series([], dtype="int64"),
                     "duration_s": pd.Series([], dtype="float64"),
                     "rms": pd.Series([], dtype="float64"),
                     "zcr": pd.Series([], dtype="float64")})
    return df.mapInPandas(fn, schema=schema)


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
