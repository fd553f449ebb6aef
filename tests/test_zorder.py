"""Z-order spatial clustering (the Kdtree-index analog): a bounding-box
query must touch far fewer files on the clustered layout than on an
unclustered one, and the box predicate must reach the parquet scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.operators.zorder import (
    candidate_files,
    write_zordered,
    zorder_code,
)

N = 20_000
N_FILES = 16
# a central-Europe-sized box (~60 of the 20k synthetic points)
BOX_LAT = (40.0, 50.0)
BOX_LON = (0.0, 20.0)


def _points(spark):
    """Deterministic synthetic geo points spread over the globe."""
    return spark.range(N).select(
        F.col("id").alias("point_id"),
        ((F.col("id") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("id") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
    )


def test_zorder_code_locality(spark):
    """Nearby points share high Morton-code bits; antipodal points do
    not — the property that makes range-partitioning spatial."""
    df = spark.createDataFrame(
        [(52.50, 13.40), (52.51, 13.41), (-33.86, 151.21)],
        "lat double, lon double",
    )
    a, b, c = [
        r.z for r in df.select(zorder_code(F.col("lat"), F.col("lon")).alias("z")).collect()
    ]
    assert abs(a - b) < abs(a - c)
    assert 0 <= a < (1 << 62)


def test_bbox_prunes_clustered_files(spark, tmp_path):
    pts = _points(spark)
    clustered = str(tmp_path / "clustered")
    unclustered = str(tmp_path / "unclustered")
    write_zordered(pts, clustered, n_files=N_FILES)
    # control: same data, same file count, random (hash) layout
    (
        pts.repartition(N_FILES, "point_id")
        .write.mode("overwrite")
        .parquet(unclustered)
    )

    hit_c, total_c = candidate_files(clustered, BOX_LAT, BOX_LON)
    hit_u, total_u = candidate_files(unclustered, BOX_LAT, BOX_LON)
    assert total_c == N_FILES and total_u == N_FILES
    # random layout: every file spans the globe → zero pruning
    assert hit_u == N_FILES
    # clustered layout: the box lives in a handful of z-ranges
    assert hit_c <= N_FILES // 4, f"clustered layout hit {hit_c}/{total_c} files"

    # identical query results on both layouts
    def bbox(path):
        return (
            spark.read.parquet(path)
            .filter(
                F.col("lat").between(*BOX_LAT) & F.col("lon").between(*BOX_LON)
            )
            .select("point_id")
        )

    ids_c = sorted(r.point_id for r in bbox(clustered).collect())
    ids_u = sorted(r.point_id for r in bbox(unclustered).collect())
    assert ids_c == ids_u and len(ids_c) > 0


def test_bbox_filter_pushed_to_scan(spark, tmp_path):
    path = str(tmp_path / "z")
    write_zordered(_points(spark), path, n_files=4)
    plan = (
        spark.read.parquet(path)
        .filter(F.col("lat").between(*BOX_LAT) & F.col("lon").between(*BOX_LON))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bbox bounds reach the parquet scan (the PushedFilters list is
    # truncated in toString, so check the leading lat bounds only)
    assert "PushedFilters: [IsNotNull(lat)" in plan, plan[:2000]
    assert "GreaterThanOrEqual(lat,40.0)" in plan, plan[:2000]
    assert "LessThanOrEqual(lat,50.0)" in plan, plan[:2000]
