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
