"""Golden-file pins (FIXTURES.md §3.4): WKB bytes, extractor output,
cell assignment, and PIP join results are locked — any behavioral change
fails here rather than drifting silently. Pure NumPy tier (no Spark);
the Spark paths are proven equal to these kernels elsewhere."""

from __future__ import annotations

import json
import os

import numpy as np

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    with open(os.path.join(GOLD, name)) as f:
        return json.load(f)


def test_wkb_bytes_golden():
    from geospark.kernels.geom import parse_wkt
    from geospark.kernels.wkb import parse_wkb, write_wkb
    for row in _load("roundtrip_corpus.json"):
        g = parse_wkt(row["wkt"])
        if g is None:
            assert row["wkb_hex"] is None
            continue
        assert write_wkb(g).hex() == row["wkb_hex"], row["wkt"]
        assert parse_wkb(bytes.fromhex(row["wkb_hex"])).equals_exact(g)


def test_text_extraction_golden():
    from geospark.sources.synth import page_batch
    exp = _load("text_extract.json")
    pdf = page_batch(np.arange(100))
    for i in range(100):
        url = pdf["url"].iloc[i]
        assert pdf["text"].iloc[i] == exp[url], url


def test_geotag_golden():
    from geospark.operators.extract import extract_geotags_batch
    from geospark.sources.synth import page_batch
    pdf = page_batch(np.arange(100))
    tags = extract_geotags_batch(pdf["html"])
    got = [(pdf["url"].iloc[int(r.row_idx)], round(r.lat, 9),
            round(r.lon, 9), r.kind)
           for r in tags.itertuples(index=False)]
    exp = [(r["url"], round(r["lat"], 9), round(r["lon"], 9), r["kind"])
           for r in _load("page_geotags.json")]
    assert got == exp


def test_cell_assign_golden():
    import duckdb
    from geospark.functions.cells import encode_np
    exp = _load("cell_assign.json")
    df = duckdb.sql(
        "SELECT c_custkey, CAST(c_custkey % 180 AS DOUBLE) - 90.0 AS lat,"
        " ((c_acctbal % 360.0) + 360.0) % 360.0 - 180.0 AS lon "
        "FROM '/root/testdata/sf0.01/customer.parquet' "
        "ORDER BY c_custkey LIMIT 1000").df()
    np.testing.assert_array_equal(
        encode_np(df["lat"].to_numpy(), df["lon"].to_numpy(), 8),
        np.asarray(exp["cell_r8"]))
    np.testing.assert_array_equal(
        encode_np(df["lat"].to_numpy(), df["lon"].to_numpy(), 12),
        np.asarray(exp["cell_r12"]))


def test_pip_join_golden_bruteforce():
    from geospark.kernels.geom import parse_wkt
    from geospark.kernels.ops import point_in_rings
    from geospark.operators.extract import extract_geotags_batch
    from geospark.sources.synth import page_batch, zone_defs
    exp = {(r["url"], round(r["lat"], 9), round(r["lon"], 9), r["kind"],
            r["zone_id"]) for r in _load("pip_join_small.json")}
    pdf = page_batch(np.arange(500))
    tags = extract_geotags_batch(pdf["html"])
    urls = pdf["url"].iloc[tags["row_idx"].to_numpy()].to_numpy()
    lat = tags["lat"].to_numpy()
    lon = tags["lon"].to_numpy()
    got = set()
    for zid, name, wkt in zone_defs():
        if wkt is None:
            continue
        g = parse_wkt(wkt)
        if g.is_empty:
            continue
        rings = [r[:, :2] for r in g.rings]
        for i in np.nonzero(point_in_rings(lon, lat, rings))[0]:
            got.add((urls[i], round(float(lat[i]), 9),
                     round(float(lon[i]), 9), tags["kind"].iloc[int(i)],
                     zid))
    assert got == exp
