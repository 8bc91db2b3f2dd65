

def test_ring_metrics_known_shapes(spark):
    """Shoelace metrics against hand-computed values: unit-ish square
    (CCW positive), the same square CW (sign flips), and a concave
    L-shape whose centroid is NOT the vertex mean — pinning that the
    operator computes the polygon centroid, not the vertex average."""
    from pyspark.sql import functions as F

    from transformio_spark.operators.vector_geom import ring_metrics

    rows = []
    sq = [(0, 0), (10, 0), (10, 10), (0, 10)]           # area 100, c (5,5)
    for i, (x, y) in enumerate(sq):
        rows.append(("sq", 0, 0, i, float(x), float(y)))
    for i, (x, y) in enumerate(reversed(sq)):           # CW: area2 = -200
        rows.append(("sq_cw", 0, 0, i, float(x), float(y)))
    # L-shape: (0,0)(4,0)(4,2)(2,2)(2,6)(0,6) — area 20
    # centroid: split [0,4]x[0,2] (A=8,c=(2,1)) + [0,2]x[2,6] (A=8,c=(1,4))
    #   wait: L area = 4*2 + 2*4 = 16, centroid = ((8*2+8*1)/16,(8*1+8*4)/16)
    #   = (1.5, 2.5)
    L = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 6), (0, 6)]
    for i, (x, y) in enumerate(L):
        rows.append(("L", 0, 0, i, float(x), float(y)))
    df = spark.createDataFrame(
        rows,
        "geom_id string, part_id int, ring_id int, pt_seq int, "
        "x double, y double",
    )
    got = {r["geom_id"]: r for r in ring_metrics(df).collect()}
    assert got["sq"]["area2"] == 200 and got["sq"]["n_vertices"] == 4
    assert got["sq"]["centroid_x"] == 5.0 and got["sq"]["centroid_y"] == 5.0
    assert got["sq_cw"]["area2"] == -200
    assert got["sq_cw"]["centroid_x"] == 5.0
    assert got["L"]["area2"] == 32
    assert got["L"]["centroid_x"] == 1.5 and got["L"]["centroid_y"] == 2.5
