"""GPS DMS->decimal golden vectors (mirrors reference
internal/metadata/metadata_test.go:14-74) + 2-D geo grid + folder_of."""

import pytest
from pyspark.sql import functions as F

from picdexer_spark.operators import geo


# reference TestConvertGPSCoordinates vectors (float32 there; float64 here)
CONVERT_CASES = [
    ("""1 deg 11' 60" N, 1 deg 11' 60" W""", 1.2, -1.2),
    ("""b deg 11' 60" N, 1 deg 11' 60" W""", None, None),   # unparsable lat
    ("""1 deg 11' 60" N, b deg 11' 60" W""", None, None),   # unparsable long
    ("a b", None, None),                                     # wrong size
    # TestDegMinSecToDecimal letter/sign vectors, lifted to full strings
    ("""1 deg 11' 60" Q, 1 deg 11' 60" W""", None, None),   # unsupported letter
    ("""1.0 deg 11.0' 60.0" N, 1 deg 11' 60" E""", 1.2, 1.2),
    ("""1 deg 11' 60" S, 1 deg 11' 60" E""", -1.2, 1.2),
    ("""48 deg 51' 52.97" N, 2 deg 17' 56.77" E""",
     48 + 51 / 60 + 52.97 / 3600, 2 + 17 / 60 + 56.77 / 3600),
]


def test_gps_convert_golden_vectors(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _, _) in enumerate(CONVERT_CASES)], "i long, gps string"
    )
    got = {r["i"]: r for r in geo.gps_to_decimal(df, "gps").collect()}
    for i, (_, lat, lon) in enumerate(CONVERT_CASES):
        if lat is None:
            assert got[i]["lat"] is None and got[i]["lon"] is None, i
        else:
            assert got[i]["lat"] == pytest.approx(lat, abs=1e-12), i
            assert got[i]["lon"] == pytest.approx(lon, abs=1e-12), i


def test_geo_grid_2d(spark):
    pts = [
        (0, """10 deg 0' 0" N, 20 deg 0' 0" E"""),
        (1, """10 deg 20' 0" N, 20 deg 10' 0" E"""),   # same cell at p=0
        (2, """10 deg 0' 0" S, 20 deg 0' 0" W"""),     # mirrored cell
        (3, "garbage"),                                  # no point -> no cell
    ]
    df = geo.gps_to_decimal(
        spark.createDataFrame(pts, "i long, gps string"), "gps"
    )
    cells = {(r["cell_lat"], r["cell_lon"]): r["n"]
             for r in geo.geo_grid(df, "lat", "lon", 0).collect()}
    assert cells == {(10.0, 20.0): 2, (-10.0, -20.0): 1}


def test_folder_of(spark):
    cases = [
        ("/data/site/a.jpg", "/data/site"),
        ("a/b.jpg", "a"),
        ("b.jpg", "."),        # filepath.Dir on a bare name
        ("/b.jpg", "/"),       # root file
    ]
    df = spark.createDataFrame(cases, "p string, expect string")
    rows = df.select(geo.folder_of("p").alias("got"), "expect").collect()
    for r in rows:
        assert r["got"] == r["expect"]


# ---------------------------------- geo_distance + geotile_grid (round 5)

def _hav_py(lat1, lon1, lat2, lon2):
    import math
    la1, lo1, la2, lo2 = map(math.radians, (lat1, lon1, lat2, lon2))
    h = (math.sin((la2 - la1) / 2) ** 2
         + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2)
    return 2 * geo.EARTH_RADIUS_KM * math.asin(math.sqrt(h))


PARIS = (48.8566, 2.3522)
POINTS = [
    (51.5074, -0.1278),   # London  ~344 km from Paris
    (48.8566, 2.3522),    # Paris itself, 0 km
    (40.7128, -74.0060),  # New York ~5837 km
    (-33.8688, 151.2093),  # Sydney ~16960 km
    (48.86, 2.36),        # next door
    (None, 10.0),         # null lat -> never matches
]


@pytest.fixture(scope="module")
def geo_pts(spark):
    return spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(POINTS)],
        "id long, lat double, lon double")


def test_haversine_matches_reference(spark, geo_pts):
    got = {r["id"]: r["d"] for r in geo_pts.select(
        "id", geo.haversine_km(F.col("lat"), F.col("lon"),
                               *PARIS).alias("d")).collect()}
    for i, (la, lo) in enumerate(POINTS):
        if la is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(
                _hav_py(la, lo, *PARIS), rel=1e-12), i
    # sanity: the classic Paris->London distance
    assert 340 < got[0] < 348


def test_geo_distance_filter(spark, geo_pts):
    ids = sorted(r["id"] for r in geo.geo_distance_filter(
        geo_pts, "lat", "lon", *PARIS, radius_km=400).collect())
    assert ids == [0, 1, 4]  # London, Paris, next door; NULL row out
    # boundary is inclusive (<= radius): radius exactly at London's
    # distance keeps London
    d_lon = _hav_py(*POINTS[0], *PARIS)
    ids = sorted(r["id"] for r in geo.geo_distance_filter(
        geo_pts, "lat", "lon", *PARIS, radius_km=d_lon).collect())
    assert 0 in ids


def test_geo_distance_rings(spark, geo_pts):
    rings = geo.geo_distance_rings(
        geo_pts, "lat", "lon", *PARIS,
        ranges=[(None, 500.0), (500.0, 10000.0), (10000.0, None),
                (0.0, 6000.0)]).collect()  # last one OVERLAPS ring 0+1
    got = [(r["ring"], r["from_km"], r["to_km"], r["doc_count"])
           for r in rings]
    assert got == [(0, None, 500.0, 3), (1, 500.0, 10000.0, 1),
                   (2, 10000.0, None, 1), (3, 0.0, 6000.0, 4)]
    # empty rings are kept (the ES contract)
    empty = geo.geo_distance_rings(
        geo_pts, "lat", "lon", *PARIS, ranges=[(20000.0, None)]).collect()
    assert [(r["ring"], r["doc_count"]) for r in empty] == [(0, 0)]
    with pytest.raises(ValueError):
        geo.geo_distance_rings(geo_pts, "lat", "lon", *PARIS, ranges=[])


def _tile_py(lat, lon, zoom):
    import math
    t = 2 ** zoom
    lat = max(-geo.MERCATOR_LAT, min(geo.MERCATOR_LAT, lat))
    x = math.floor((lon + 180.0) / 360.0 * t)
    phi = math.radians(lat)
    y = math.floor(
        (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.pi)
        / 2.0 * t)
    return min(max(x, 0), t - 1), min(max(y, 0), t - 1)


def test_geotile_grid_matches_reference(spark):
    import collections
    pts = [(la, lo) for la in (-89.0, -45.0, 0.0, 37.5, 85.3, 48.86)
           for lo in (-179.9, -90.0, 0.0, 0.1, 120.0, 179.9)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for zoom in (0, 3, 7):
        want = collections.Counter(_tile_py(la, lo, zoom)
                                   for la, lo in pts)
        want_rows = sorted(
            [(f"{zoom}/{x}/{y}", x, y, n)
             for (x, y), n in want.items()],
            key=lambda r: (-r[3], r[1], r[2]))[:10]
        got = [(r["key"], r["tile_x"], r["tile_y"], r["doc_count"])
               for r in geo.geotile_grid(df, "lat", "lon", zoom).collect()]
        assert got == want_rows, zoom
    # polar points clamp into the edge rows, never out of range
    assert _tile_py(-89.0, 0.0, 3) == (4, 7)
    with pytest.raises(ValueError):
        geo.geotile_grid(df, "lat", "lon", 30)


def test_geo_line_orders_caps_and_flags(spark):
    from picdexer_spark.operators.geo import geo_line
    pts = spark.createDataFrame(
        [("a", 3, 10, 20), ("a", 1, 11, 21), ("a", 2, 12, 22),
         ("b", 1, 30, 40), ("b", 2, None, 41)],
        "g string, s long, lon long, lat long")
    got = {r["g"]: r for r in
           geo_line(pts, "g", "s", "lat", "lon", size=2).collect()}
    # sorted by s; capped to FIRST 2 points; GeoJSON "lon lat" order
    assert got["a"]["line"] == "11 21;12 22"
    assert got["a"]["n_points"] == 2 and got["a"]["complete"] is False
    # null-coordinate rows drop before counting
    assert got["b"]["line"] == "30 40" and got["b"]["complete"] is True
    full = {r["g"]: r for r in
            geo_line(pts, "g", "s", "lat", "lon", size=10).collect()}
    assert full["a"]["line"] == "11 21;12 22;10 20"
    assert full["a"]["complete"] is True


# -------------------------------------- geo_bounding_box (round 6)

def test_geo_bounding_box_basic_and_antimeridian(spark, geo_pts):
    # plain viewport: Europe-ish box keeps Paris + next door, not
    # London (lon < left edge) — corners are (top, left, bottom, right)
    ids = sorted(r["id"] for r in geo.geo_bounding_box(
        geo_pts, "lat", "lon", top=50.0, left=1.0, bottom=45.0,
        right=3.0).collect())
    assert ids == [1, 4]
    # London enters when the box widens west
    ids = sorted(r["id"] for r in geo.geo_bounding_box(
        geo_pts, "lat", "lon", top=52.0, left=-1.0, bottom=45.0,
        right=3.0).collect())
    assert ids == [0, 1, 4]
    # antimeridian-crossing box (left > right): Pacific viewport
    # catches Sydney (lon 151.2 >= 140) but nothing in the Atlantic
    ids = sorted(r["id"] for r in geo.geo_bounding_box(
        geo_pts, "lat", "lon", top=0.0, left=140.0, bottom=-60.0,
        right=-140.0).collect())
    assert ids == [3]
    # NULL coordinates never match, even in a whole-world box
    ids = sorted(r["id"] for r in geo.geo_bounding_box(
        geo_pts, "lat", "lon", top=90.0, left=-180.0, bottom=-90.0,
        right=180.0).collect())
    assert ids == [0, 1, 2, 3, 4]
    # boundary is inclusive on all four edges
    ids = sorted(r["id"] for r in geo.geo_bounding_box(
        geo_pts, "lat", "lon", top=48.8566, left=2.3522,
        bottom=48.8566, right=2.3522).collect())
    assert ids == [1]


def test_geo_bounding_box_refusals(spark, geo_pts):
    with pytest.raises(ValueError):  # top < bottom
        geo.geo_bounding_box(geo_pts, "lat", "lon", top=-10.0,
                             left=0.0, bottom=10.0, right=5.0)
    with pytest.raises(ValueError):  # latitude out of range
        geo.geo_bounding_box(geo_pts, "lat", "lon", top=91.0,
                             left=0.0, bottom=0.0, right=5.0)
    with pytest.raises(ValueError):  # longitude out of range
        geo.geo_bounding_box(geo_pts, "lat", "lon", top=10.0,
                             left=-181.0, bottom=0.0, right=5.0)
