"""Schema evolution on read/union — an engine a reference user migrates to
must absorb added columns without rewriting history (the reference's
velocity-store generations differ in exactly this way)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_read_across_generations(spark, tmp_path):
    gen1 = spark.createDataFrame([(1, "a")], ["id", "color"])
    gen2 = spark.createDataFrame([(2, "b", 9.5)], ["id", "color", "speed"])
    gen1.write.parquet(str(tmp_path / "t" / "g=1"))
    gen2.write.parquet(str(tmp_path / "t" / "g=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert set(merged.columns) >= {"id", "color", "speed"}
    rows = {r.id: r.speed for r in merged.select("id", "speed").collect()}
    assert rows == {1: None, 2: 9.5}


def test_union_by_name_allow_missing(spark):
    old = spark.createDataFrame([(1, "a")], ["id", "color"])
    new = spark.createDataFrame([(2, 3.5)], ["id", "speed"])
    u = old.unionByName(new, allowMissingColumns=True)
    got = {r.id: (r.color, r.speed) for r in u.collect()}
    assert got == {1: ("a", None), 2: (None, 3.5)}


def test_evolved_column_prunes_from_old_files(spark, tmp_path):
    """Selecting only legacy columns must not force the evolved schema's
    extra columns into the scan (ReadSchema stays pruned)."""
    spark.createDataFrame([(1, "a")], ["id", "color"]).write.parquet(
        str(tmp_path / "t" / "g=1")
    )
    spark.createDataFrame([(2, "b", 9.5)], ["id", "color", "speed"]).write.parquet(
        str(tmp_path / "t" / "g=2")
    )
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(str(tmp_path / "t"))
        .select("id", "color")
        .filter(F.col("id") > 0)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "speed" not in plan.split("ReadSchema")[-1]
    assert df.count() == 2
