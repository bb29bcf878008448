"""Vectorized geometry predicates: ray-cast point-in-polygon, envelopes,
distances, segment/rectangle intersection.

All functions are batch NumPy (the hot path inside pandas UDFs: one
polygon x N points per call, broadcast over edges). Numeric-determinism
policy (load-bearing for the DuckDB oracle): predicates use only
+,-,*,comparisons (IEEE-exact, identical across engines); transcendental
distance (haversine) is provided for reporting but query outputs that
cross the oracle boundary round it, and kNN ordering uses squared
euclidean degrees (exact) with an id tiebreak.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371008.8


def point_in_rings(px: np.ndarray, py: np.ndarray,
                   rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd ray cast: True where (px,py) is inside the polygon
    defined by ``rings`` (ring 0 exterior, rest holes — even-odd handles
    holes with no orientation requirement). Boundary points follow the
    standard half-open convention (left/bottom edges in, right/top out,
    up to the strict-inequality asymmetry).

    Vectorized (E edges x N points) per ring; E is small (zone polygons),
    N is the Arrow batch size."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        if ring.shape[0] < 3:
            continue
        x1 = ring[:-1, 0][:, None]  # (E,1)
        y1 = ring[:-1, 1][:, None]
        x2 = ring[1:, 0][:, None]
        y2 = ring[1:, 1][:, None]
        cond = (y1 > py[None, :]) != (y2 > py[None, :])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (py[None, :] - y1) / (y2 - y1) + x1
        crossings = cond & (px[None, :] < xint)
        inside ^= (crossings.sum(axis=0) % 2).astype(bool)
    return inside


def point_in_rings_sql(px_expr: str, py_expr: str,
                       rings: list[np.ndarray]) -> str:
    """The SAME even-odd ray cast as an unrolled ANSI-SQL boolean
    expression for a *fixed* polygon — the DuckDB-oracle twin of
    point_in_rings. One CASE term per edge; identical arithmetic
    (*,/,+,comparisons) so results match bit-for-bit."""
    terms = []
    for ring in rings:
        if ring.shape[0] < 3:
            continue
        for i in range(ring.shape[0] - 1):
            x1, y1 = repr(float(ring[i, 0])), repr(float(ring[i, 1]))
            x2, y2 = repr(float(ring[i + 1, 0])), repr(float(ring[i + 1, 1]))
            terms.append(
                f"(CASE WHEN (({y1} > {py_expr}) <> ({y2} > {py_expr})) "
                f"AND ({px_expr} < ({x2} - {x1}) * ({py_expr} - {y1}) "
                f"/ ({y2} - {y1}) + {x1}) THEN 1 ELSE 0 END)")
    if not terms:
        return "FALSE"
    # balanced sum tree, NOT a flat join: a left-deep `t1 + ... + tn`
    # chain parses/compiles with O(n) recursion depth — janino dies
    # with a fatal (non-recoverable: StackOverflowError bypasses the
    # WSCG interpreted fallback) stack overflow near ~300 edges, and
    # Catalyst's own TreeNode recursion is O(depth) too. Balancing
    # makes depth O(log n); integer addition is associative so the
    # value (and the DuckDB twin, which reads the same string) is
    # unchanged.
    while len(terms) > 1:
        terms = [f"({terms[i]} + {terms[i + 1]})"
                 if i + 1 < len(terms) else terms[i]
                 for i in range(0, len(terms), 2)]
    return f"((({terms[0]}) % 2) = 1)"


def seg_rect_intersect(ring: np.ndarray, rx0: np.ndarray, ry0: np.ndarray,
                       rx1: np.ndarray, ry1: np.ndarray) -> np.ndarray:
    """Conservative: True where any edge of ``ring`` has a bounding box
    overlapping rect i. Superset of true segment/rect intersection —
    used only for polygon covering, where false positives are removed by
    the exact refine."""
    ex0 = np.minimum(ring[:-1, 0], ring[1:, 0])[:, None]
    ex1 = np.maximum(ring[:-1, 0], ring[1:, 0])[:, None]
    ey0 = np.minimum(ring[:-1, 1], ring[1:, 1])[:, None]
    ey1 = np.maximum(ring[:-1, 1], ring[1:, 1])[:, None]
    hit = ((ex0 <= rx1[None, :]) & (ex1 >= rx0[None, :])
           & (ey0 <= ry1[None, :]) & (ey1 >= ry0[None, :]))
    return hit.any(axis=0)


def envelope(coords: np.ndarray) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) of an (k, >=2) coord array; NaN-safe."""
    if coords.shape[0] == 0:
        return (np.nan, np.nan, np.nan, np.nan)
    return (float(np.nanmin(coords[:, 0])), float(np.nanmin(coords[:, 1])),
            float(np.nanmax(coords[:, 0])), float(np.nanmax(coords[:, 1])))


def geom_envelope(g) -> tuple[float, float, float, float]:
    """Envelope of a Geom (any type)."""
    if g is None or g.is_empty:
        return (np.nan, np.nan, np.nan, np.nan)
    if g.type_id in (1, 2):
        return envelope(g.coords)
    if g.type_id == 3:
        return envelope(np.concatenate(g.rings, axis=0))
    envs = [geom_envelope(p) for p in g.parts if not p.is_empty]
    if not envs:
        return (np.nan, np.nan, np.nan, np.nan)
    a = np.array(envs)
    return (float(a[:, 0].min()), float(a[:, 1].min()),
            float(a[:, 2].max()), float(a[:, 3].max()))


def haversine_np(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (vectorized). Transcendental —
    round before crossing an engine boundary (see module docstring)."""
    la1, lo1, la2, lo2 = (np.radians(np.asarray(a, dtype=np.float64))
                          for a in (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    h = (np.sin(dlat / 2.0) ** 2
         + np.cos(la1) * np.cos(la2) * np.sin(dlon / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def sqdist_deg_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Squared euclidean distance in degrees as SQL text (exact IEEE
    arithmetic, safe across engines). Spark twin: sqdist_deg_col."""
    return (f"(({lat1}) - ({lat2})) * (({lat1}) - ({lat2})) "
            f"+ (({lon1}) - ({lon2})) * (({lon1}) - ({lon2}))")


def sqdist_deg_col(lat1, lon1, lat2, lon2):
    return (lat1 - lat2) * (lat1 - lat2) + (lon1 - lon2) * (lon1 - lon2)


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of one closed ring (first == last row).
    Positive for counter-clockwise."""
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]) / 2.0)


def geom_area(g) -> float:
    """Planar area in coordinate units²: polygons = |exterior| minus
    |holes| (WKT ring-role convention, orientation-agnostic);
    multipolygons sum their parts; points/linestrings = 0.0; null/EMPTY
    = 0.0. (The reference has no measures — this is engine surface the
    RULE tier adds on top of the §2.1 kernels.)"""
    if g is None or g.is_empty:
        return 0.0
    if g.type_id == 3:
        rs = g.rings
        return (abs(ring_signed_area(rs[0][:, :2]))
                - sum(abs(ring_signed_area(r[:, :2])) for r in rs[1:]))
    if g.type_id in (6, 7):
        return sum(geom_area(p) for p in g.parts)
    return 0.0


def _orient(ax, ay, bx, by, cx, cy):
    """Sign of the cross product (b-a) x (c-a) — broadcastable."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segments_intersect_any(a: np.ndarray, b: np.ndarray) -> bool:
    """True if ANY segment of polyline ``a`` intersects ANY segment of
    polyline ``b`` (proper crossings, endpoint touches, and collinear
    overlaps all count — closed ST_Intersects semantics). Vectorized
    E_a x E_b orientation tests; exact for all configurations where the
    orientation signs are exact (+,-,* IEEE arithmetic)."""
    if a.shape[0] < 2 or b.shape[0] < 2:
        return False
    ax1, ay1 = a[:-1, 0][:, None], a[:-1, 1][:, None]
    ax2, ay2 = a[1:, 0][:, None], a[1:, 1][:, None]
    bx1, by1 = b[:-1, 0][None, :], b[:-1, 1][None, :]
    bx2, by2 = b[1:, 0][None, :], b[1:, 1][None, :]
    d1 = _orient(bx1, by1, bx2, by2, ax1, ay1)
    d2 = _orient(bx1, by1, bx2, by2, ax2, ay2)
    d3 = _orient(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = _orient(ax1, ay1, ax2, ay2, bx2, by2)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    if proper.any():
        return True

    def on_seg(px, py, qx, qy, rx, ry):
        # collinearity established by caller; r within bbox of pq
        return (np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx)) \
            & (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy))

    touch = ((d1 == 0) & on_seg(bx1, by1, bx2, by2, ax1, ay1)) \
        | ((d2 == 0) & on_seg(bx1, by1, bx2, by2, ax2, ay2)) \
        | ((d3 == 0) & on_seg(ax1, ay1, ax2, ay2, bx1, by1)) \
        | ((d4 == 0) & on_seg(ax1, ay1, ax2, ay2, bx2, by2))
    return bool(touch.any())


def point_on_boundary(px: np.ndarray, py: np.ndarray,
                      rings: list[np.ndarray]) -> np.ndarray:
    """True where (px,py) lies ON a ring edge (collinear + within the
    edge bbox) — the closed-boundary complement to the half-open
    even-odd ray cast."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    out = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        if ring.shape[0] < 2:
            continue
        x1, y1 = ring[:-1, 0][:, None], ring[:-1, 1][:, None]
        x2, y2 = ring[1:, 0][:, None], ring[1:, 1][:, None]
        d = _orient(x1, y1, x2, y2, px[None, :], py[None, :])
        hit = (d == 0) \
            & (np.minimum(x1, x2) <= px[None, :]) \
            & (px[None, :] <= np.maximum(x1, x2)) \
            & (np.minimum(y1, y2) <= py[None, :]) \
            & (py[None, :] <= np.maximum(y1, y2))
        out |= hit.any(axis=0)
    return out


def point_in_rings_closed(px, py, rings: list[np.ndarray]) -> np.ndarray:
    """Closed containment: even-odd interior OR exactly on the
    boundary (ST_Intersects point-vs-areal semantics; the half-open
    ray cast alone drops right/top-edge points)."""
    return point_in_rings(px, py, rings) | point_on_boundary(px, py, rings)


def polys_intersect(pgs_a: list[list[np.ndarray]],
                    pgs_b: list[list[np.ndarray]]) -> bool:
    """Exact areal-areal intersection test (closed semantics: shared
    boundary counts). Each argument is a list of polygons, each a list
    of closed rings (exterior first). True iff:
      * any vertex of one lies inside (even-odd, holes honored) or on
        the boundary of the other, or
      * any pair of ring edges intersects (covers all crossing
        configurations with no contained vertex).
    Cost: O(E_a * E_b) vectorized orientation tests per polygon pair —
    the refine step AFTER cell-cover candidate pruning, so E_a/E_b are
    per-feature edge counts, not table sizes."""
    for ra in pgs_a:
        for rb in pgs_b:
            va = ra[0]
            vb = rb[0]
            if point_in_rings_closed(va[:, 0], va[:, 1], rb).any():
                return True
            if point_in_rings_closed(vb[:, 0], vb[:, 1], ra).any():
                return True
            for ring_a in ra:
                for ring_b in rb:
                    if segments_intersect_any(ring_a[:, :2],
                                              ring_b[:, :2]):
                        return True
    return False


def geom_length(g) -> float:
    """Planar length in coordinate units of the LINEAL parts of a
    geometry (PostGIS ST_Length semantics: polygons and points
    contribute 0; multilinestrings sum; collections recurse).
    Segment norms via np.sqrt (correctly rounded -> cross-engine
    deterministic for exactly-representable inputs)."""
    if g is None or g.is_empty:
        return 0.0
    if g.type_id == 2:
        d = np.diff(g.coords[:, :2], axis=0)
        return float(np.sum(np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)))
    if g.type_id in (5, 7):
        return sum(geom_length(p) for p in g.parts)
    return 0.0


def simplify_coords(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification (iterative stack, NumPy
    span distances): keep both endpoints, recursively keep the point
    farthest from the current chord while that distance exceeds
    ``tol``. Distance = perpendicular distance to the chord line
    (point distance when the chord is degenerate — the closed-ring
    start==end case, where the first split keys off the farthest
    vertex)."""
    p = np.asarray(pts, dtype=np.float64)
    return p[_simplify_keepmask(p, tol)]


def geom_simplify(g, tol: float):
    """Douglas-Peucker over any geometry: linestrings simplified;
    polygon rings simplified independently (a ring whose simplification
    would drop below 4 points keeps its original coords — conservative,
    never produces an invalid ring); points unchanged; multis/
    collections recurse. Extra dims (Z/M) of dropped vertices drop with
    them; retained vertices keep their full coordinates."""
    if g is None or g.is_empty:
        return g
    from .geom import Geom
    t = g.type_id
    if t == 1:
        return g
    if t == 2:
        keep = _simplify_keepmask(g.coords, tol)
        return Geom(2, g.has_z, g.has_m, coords=g.coords[keep])
    if t == 3:
        rings = []
        for r in g.rings:
            keep = _simplify_keepmask(r, tol)
            rings.append(r[keep] if int(keep.sum()) >= 4 else r)
        return Geom(3, g.has_z, g.has_m, rings=rings)
    return Geom(t, g.has_z, g.has_m,
                parts=[geom_simplify(p, tol) for p in g.parts])


def _simplify_keepmask(coords: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep mask of simplify_coords over the XY of ``coords``
    (so Z/M columns travel with their retained rows)."""
    p = coords[:, :2]
    n = p.shape[0]
    if n <= 2:
        return np.ones(n, dtype=bool)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        sub = p[i + 1:j]
        dx = p[j, 0] - p[i, 0]
        dy = p[j, 1] - p[i, 1]
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            d = np.sqrt((sub[:, 0] - p[i, 0]) ** 2
                        + (sub[:, 1] - p[i, 1]) ** 2)
        else:
            d = np.abs(dx * (sub[:, 1] - p[i, 1])
                       - dy * (sub[:, 0] - p[i, 0])) / np.sqrt(l2)
        k = int(np.argmax(d))
        if d[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def _decompose(g, pts: list, lines: list, areals: list) -> None:
    """Split any Geom into point coords, polylines, and areal
    ring-lists (collections recurse)."""
    if g is None or g.is_empty:
        return
    t = g.type_id
    if t == 1:
        pts.append(g.coords[:, :2])
    elif t == 2:
        lines.append(g.coords[:, :2])
    elif t == 3:
        areals.append([r[:, :2] for r in g.rings])
    else:
        for p in g.parts:
            _decompose(p, pts, lines, areals)


def geom_intersects(ga, gb) -> bool:
    """Exact ST_Intersects for any pair of geometry types (closed
    semantics: shared boundaries/vertices count; null or EMPTY
    intersects nothing). Engine surface the RULE tier adds on top of
    the §2.1 kernels — the reference has no predicates at all
    (geoarrow_geos.c is pure encode/decode).

    Dispatch: envelope reject, then decompose both sides into
    point/line/areal components and test every cross-dimension pair
    with the vectorized primitives above."""
    if ga is None or gb is None or ga.is_empty or gb.is_empty:
        return False
    ea, eb = geom_envelope(ga), geom_envelope(gb)
    if not (ea[0] <= eb[2] and eb[0] <= ea[2]
            and ea[1] <= eb[3] and eb[1] <= ea[3]):
        return False
    pa: list = []
    la: list = []
    aa: list = []
    pb_: list = []
    lb: list = []
    ab: list = []
    _decompose(ga, pa, la, aa)
    _decompose(gb, pb_, lb, ab)
    for A in aa:
        for B in ab:
            if polys_intersect([A], [B]):
                return True
    for P in pa:
        for B in ab:
            if point_in_rings_closed(P[:, 0], P[:, 1], B).any():
                return True
        for L in lb:
            if point_on_boundary(P[:, 0], P[:, 1], [L]).any():
                return True
        for Q in pb_:
            if ((P[:, None, 0] == Q[None, :, 0])
                    & (P[:, None, 1] == Q[None, :, 1])).any():
                return True
    for Q in pb_:
        for A in aa:
            if point_in_rings_closed(Q[:, 0], Q[:, 1], A).any():
                return True
        for L in la:
            if point_on_boundary(Q[:, 0], Q[:, 1], [L]).any():
                return True
    for L in la:
        for A in ab:
            if point_in_rings_closed(L[:, 0], L[:, 1], A).any():
                return True
            for ring in A:
                if segments_intersect_any(L, ring):
                    return True
        for M in lb:
            if segments_intersect_any(L, M):
                return True
    for M in lb:
        for A in aa:
            if point_in_rings_closed(M[:, 0], M[:, 1], A).any():
                return True
            for ring in A:
                if segments_intersect_any(M, ring):
                    return True
    return False


def polygon_batch_area_centroid(pb, n: int
                                ) -> tuple[np.ndarray, np.ndarray,
                                           np.ndarray]:
    """Shoelace area + area-weighted centroid over a whole decoded
    polygon batch (wkb.PolygonBatch) at once — the vectorized twin of
    ``geom_area``/``geom_centroid`` for the rows ``pb.ok`` covers.

    Returns (area[n], cx[n], cy[n]); rows not decoded by the batch (or
    with zero total ring weight) get area 0.0 and NaN centroids — the
    caller overrides them from its fallback path. All per-ring sums are
    one ``np.add.reduceat`` over the flat coord arrays; per-polygon
    accumulation is ``np.add.at`` keyed by ring->polygon index. Ring
    role follows the WKT convention exactly as the scalar kernels do:
    ring 0 adds, later rings (holes) subtract, orientation-agnostic."""
    area = np.zeros(n)
    wsum = np.zeros(n)
    cxw = np.zeros(n)
    cyw = np.zeros(n)
    rc = pb.ring_rows
    x, y = pb.xs, pb.ys
    C = x.size
    if rc.size and C >= 2:
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        cxe = (x[:-1] + x[1:]) * cross
        cye = (y[:-1] + y[1:]) * cross
        # rings are adjacent in the flat arrays, so ring i's shoelace
        # terms are cross[start_i : start_{i+1}-1]; zeroing each ring's
        # LAST flat element removes the inter-ring seam terms and makes
        # one reduceat over ring starts produce exact per-ring sums
        ring_last = pb.ring_row_start + rc - 1
        seam = ring_last[ring_last < C - 1]
        cross[seam] = 0.0
        cxe[seam] = 0.0
        cye[seam] = 0.0
        starts = np.minimum(pb.ring_row_start, C - 2)
        a2 = np.add.reduceat(cross, starts)
        sx = np.add.reduceat(cxe, starts)
        sy = np.add.reduceat(cye, starts)
        # reduceat returns arr[i] (not 0) for empty segments; rings
        # with <3 distinct rows have no area anyway — zero them
        degen = rc < 3
        a2[degen] = 0.0
        a = a2 / 2.0
        sign = np.where(pb.ring_ordinal == 0, 1.0, -1.0)
        w = sign * np.abs(a)
        np.add.at(area, pb.poly_of_ring, w)
        nz = a != 0.0
        cx_r = np.zeros_like(a)
        cy_r = np.zeros_like(a)
        cx_r[nz] = sx[nz] / (6.0 * a[nz])
        cy_r[nz] = sy[nz] / (6.0 * a[nz])
        np.add.at(wsum, pb.poly_of_ring, w)
        np.add.at(cxw, pb.poly_of_ring, cx_r * w)
        np.add.at(cyw, pb.poly_of_ring, cy_r * w)
    cx = np.full(n, np.nan)
    cy = np.full(n, np.nan)
    nzp = wsum != 0.0
    cx[nzp] = cxw[nzp] / wsum[nzp]
    cy[nzp] = cyw[nzp] / wsum[nzp]
    return area, cx, cy


def geom_centroid(g) -> tuple[float, float]:
    """Area-weighted centroid of polygons/multipolygons (holes
    subtract); a point returns itself; other/empty -> (nan, nan)."""
    if g is None or g.is_empty:
        return (float("nan"), float("nan"))
    if g.type_id == 1:
        return (float(g.coords[0, 0]), float(g.coords[0, 1]))

    def ring_terms(ring, sign):
        x, y = ring[:, 0], ring[:, 1]
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        a = float(np.sum(cross) / 2.0)
        w = sign * abs(a)
        if a == 0.0:
            return 0.0, 0.0, 0.0
        # shoelace centroid (dividing by the SIGNED area makes the
        # result orientation-independent)
        cx = float(np.sum((x[:-1] + x[1:]) * cross) / (6.0 * a))
        cy = float(np.sum((y[:-1] + y[1:]) * cross) / (6.0 * a))
        return w, cx * w, cy * w

    def poly_terms(poly):
        out = [ring_terms(poly.rings[0][:, :2], +1.0)]
        out += [ring_terms(r[:, :2], -1.0) for r in poly.rings[1:]]
        return out

    terms = []
    if g.type_id == 3:
        terms = poly_terms(g)
    elif g.type_id == 6:
        for p in g.parts:
            if not p.is_empty:
                terms += poly_terms(p)
    else:
        return (float("nan"), float("nan"))
    tw = sum(t[0] for t in terms)
    if tw == 0.0:
        return (float("nan"), float("nan"))
    return (sum(t[1] for t in terms) / tw, sum(t[2] for t in terms) / tw)
