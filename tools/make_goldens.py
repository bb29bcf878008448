"""Generate the committed golden files (FIXTURES.md §3.4). Run once;
tests/test_goldens.py pins current behavior against these artifacts —
any change to extractor bytes, WKB encoding, cell assignment, or the
PIP join is a test failure, not silent drift."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
GOLD = "/root/repo/tests/goldens"


def gen_roundtrip_corpus():
    from geospark.kernels import corpus
    from geospark.kernels.geom import parse_wkt
    from geospark.kernels.wkb import write_wkb
    out = []
    for suite, wkb_type, wkt in corpus.SINGLE_FIXTURES:
        g = parse_wkt(wkt)
        out.append({"suite": suite, "wkb_type": wkb_type, "wkt": wkt,
                    "wkb_hex": None if g is None else write_wkb(g).hex()})
    with open(f"{GOLD}/roundtrip_corpus.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"roundtrip_corpus.json: {len(out)} fixtures")


def gen_page_goldens():
    """Pinned ids 0..99 of the synthetic pages table: extracted text
    bytes (the byte-identical invariant) + geotags."""
    import numpy as np
    from geospark.operators.extract import extract_geotags_batch
    from geospark.sources.synth import page_batch
    pdf = page_batch(np.arange(100))
    texts = {pdf["url"].iloc[i]: pdf["text"].iloc[i] for i in range(100)}
    with open(f"{GOLD}/text_extract.json", "w") as f:
        json.dump(texts, f, indent=0, sort_keys=True)
    tags = extract_geotags_batch(pdf["html"])
    rows = [{"url": pdf["url"].iloc[int(r.row_idx)], "lat": r.lat,
             "lon": r.lon, "kind": r.kind}
            for r in tags.itertuples(index=False)]
    with open(f"{GOLD}/page_geotags.json", "w") as f:
        json.dump(rows, f, indent=0)
    print(f"text_extract.json: {len(texts)} urls; "
          f"page_geotags.json: {len(rows)} tags")


def gen_cell_assign():
    """Cell ids at res 8/12 for the first 1000 customer-derived points
    of sf0.01 (NumPy twin — the Spark/SQL twins are cross-checked in
    tests/tools)."""
    import duckdb
    import numpy as np
    from geospark.functions.cells import encode_np
    df = duckdb.sql(
        "SELECT c_custkey, CAST(c_custkey % 180 AS DOUBLE) - 90.0 AS lat,"
        " ((c_acctbal % 360.0) + 360.0) % 360.0 - 180.0 AS lon "
        "FROM '/root/testdata/sf0.01/customer.parquet' "
        "ORDER BY c_custkey LIMIT 1000").df()
    out = {"c_custkey": df["c_custkey"].tolist(),
           "cell_r8": encode_np(df["lat"].to_numpy(),
                                df["lon"].to_numpy(), 8).tolist(),
           "cell_r12": encode_np(df["lat"].to_numpy(),
                                 df["lon"].to_numpy(), 12).tolist()}
    with open(f"{GOLD}/cell_assign.json", "w") as f:
        json.dump(out, f, indent=0)
    print("cell_assign.json: 1000 points")


def gen_pip_join_small():
    """Expected (point, zone) pairs for pinned synth geotags vs the
    synth zones — NumPy brute force (the join must reproduce this)."""
    import numpy as np
    from geospark.kernels.ops import point_in_rings
    from geospark.kernels.wkb import parse_wkb
    from geospark.kernels.geom import parse_wkt
    from geospark.operators.extract import extract_geotags_batch
    from geospark.sources.synth import page_batch, zone_defs
    pdf = page_batch(np.arange(500))
    tags = extract_geotags_batch(pdf["html"])
    urls = pdf["url"].iloc[tags["row_idx"].to_numpy()].to_numpy()
    lat = tags["lat"].to_numpy()
    lon = tags["lon"].to_numpy()
    pairs = []
    for zid, name, wkt in zone_defs():
        if wkt is None:
            continue
        g = parse_wkt(wkt)
        if g.is_empty:
            continue
        rings = [r[:, :2] for r in g.rings]
        m = point_in_rings(lon, lat, rings)
        for i in np.nonzero(m)[0]:
            pairs.append({"url": urls[i], "lat": lat[i], "lon": lon[i],
                          "kind": tags["kind"].iloc[int(i)],
                          "zone_id": zid})
    with open(f"{GOLD}/pip_join_small.json", "w") as f:
        json.dump(pairs, f, indent=0)
    print(f"pip_join_small.json: {len(pairs)} pairs")


if __name__ == "__main__":
    os.makedirs(GOLD, exist_ok=True)
    gen_roundtrip_corpus()
    gen_page_goldens()
    gen_cell_assign()
    gen_pip_join_small()
