"""Onshore/offshore classification (reference 03_picking:95-123,214-224).

Ground truth pairs chosen far enough from the coarse coastline that the
embedded polygon must classify them correctly.
"""

import numpy as np

from tqdne_tpu.data.geo import JAPAN_POLYGONS, classify_onshore, points_in_polygon

# (lat, lon) of unambiguous onshore places
ONSHORE = {
    "Tokyo": (35.68, 139.69),
    "Kyoto": (35.01, 135.77),
    "Nagano": (36.65, 138.18),
    "Morioka": (39.70, 141.15),
    "Sendai": (38.27, 140.87),
    "Nagaoka": (37.45, 138.85),
    "Hiroshima": (34.39, 132.46),
    "Sapporo": (43.06, 141.35),
    "Asahikawa": (43.77, 142.37),
    "Kochi": (33.56, 133.53),
    "Matsuyama": (33.84, 132.77),
    "Kumamoto": (32.80, 130.71),
    "Fukuoka": (33.59, 130.40),
    "Naha": (26.21, 127.68),
}

# (lat, lon) of unambiguous offshore points
OFFSHORE = {
    "Tohoku 2011 epicenter": (38.32, 142.37),
    "Sea of Japan": (39.00, 135.00),
    "Pacific south of Honshu": (30.00, 140.00),
    "Korea strait": (34.00, 129.00),
    "Nankai trough": (32.50, 136.00),
    "Sea of Okhotsk": (46.50, 143.50),
    "East China Sea": (28.00, 126.00),
}


def test_onshore_points():
    lats, lons = zip(*ONSHORE.values())
    got = classify_onshore(np.array(lats), np.array(lons), method="coarse")
    for name, g in zip(ONSHORE, got):
        assert g == 1, f"{name} should be onshore"


def test_offshore_points():
    lats, lons = zip(*OFFSHORE.values())
    got = classify_onshore(np.array(lats), np.array(lons), method="coarse")
    for name, g in zip(OFFSHORE, got):
        assert g == 0, f"{name} should be offshore"


def test_ray_casting_square():
    square = np.array([(0, 0), (2, 0), (2, 2), (0, 2)], float)
    lon = np.array([1.0, 3.0, -0.5, 1.0])
    lat = np.array([1.0, 1.0, 1.0, 2.5])
    np.testing.assert_array_equal(
        points_in_polygon(lon, lat, square), [True, False, False, False]
    )


def test_ray_casting_concave():
    # L-shape: the notch (1.5, 1.5) is outside
    lshape = np.array([(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)], float)
    assert points_in_polygon([0.5], [1.5], lshape)[0]
    assert not points_in_polygon([1.5], [1.5], lshape)[0]


def test_polygons_are_simple():
    """No self-intersections in the embedded rings (pairwise segment test)."""

    def segs(poly):
        a = poly
        b = np.roll(poly, -1, axis=0)
        return a, b

    def cross2(u, v):
        return u[0] * v[1] - u[1] * v[0]

    def intersect(p1, p2, p3, p4):
        d1 = cross2(p4 - p3, p1 - p3)
        d2 = cross2(p4 - p3, p2 - p3)
        d3 = cross2(p2 - p1, p3 - p1)
        d4 = cross2(p2 - p1, p4 - p1)
        return ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))

    for ring in JAPAN_POLYGONS:
        a, b = segs(ring)
        n = len(ring)
        for i in range(n):
            for j in range(i + 2, n):
                if i == 0 and j == n - 1:
                    continue  # adjacent through closure
                assert not intersect(a[i], b[i], a[j], b[j]), (i, j)
