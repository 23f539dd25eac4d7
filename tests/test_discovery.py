"""S1-S3 discovery anti-join, O1 empty branch, K8 status upsert."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    discovery,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.sources import (
    fixtures,
)


def test_discover_new_excludes_tagged_and_non_bag(spark):
    manifest = fixtures.bag_manifest(spark, n_bags=20)
    listing = manifest.select("key")
    got = {r.key for r in discovery.discover_new(listing, manifest).collect()}
    rows = manifest.collect()
    want = {
        r.key
        for r in rows
        if r.key.endswith(".bag") and r.status not in ("complete", "failure", "in progress")
    }
    assert got == want and want
    assert not any(k.endswith(".txt") for k in got)  # S1 wildcard


def test_pick_first_is_lexicographic_min(spark):
    manifest = fixtures.bag_manifest(spark, n_bags=20)
    new = discovery.discover_new(manifest.select("key"), manifest)
    got = discovery.pick_first(new).collect()
    assert len(got) == 1
    assert got[0].key == min(r.key for r in new.collect())


def test_listing_source_feeds_discovery(spark, tmp_path):
    """S7: metadata-only listing → DataFrame → anti-join discovery."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.sources import (
        fixtures as fx,
        listing,
    )

    d = str(tmp_path / "bags")
    fx.write_bag_dir(d, n_bags=3, tar_gz=())
    with open(f"{d}/noise.txt", "w") as f:
        f.write("x")
    lst = listing.list_files(spark, d, glob="*.bag*")
    assert lst.count() == 3  # noise filtered by glob
    assert all(r.size > 0 for r in lst.collect())
    manifest = spark.createDataFrame(
        [(lst.orderBy("key").first().key, "complete")], "key string, status string"
    )
    new = discovery.discover_new(lst, manifest)
    assert new.count() == 2  # completed key excluded


def test_update_status_transitions_only_hit_keys(spark):
    manifest = fixtures.bag_manifest(spark, n_bags=10)
    target = discovery.pick_first(
        discovery.discover_new(manifest.select("key"), manifest)
    )
    tkey = target.collect()[0].key
    updated = discovery.update_status(manifest, target, "in progress")
    got = {r.key: r.status for r in updated.collect()}
    before = {r.key: r.status for r in manifest.collect()}
    assert got[tkey] == "in progress"
    for k, v in before.items():
        if k != tkey:
            assert got[k] == v
    # exactly-once replay semantics: clearing the status re-discovers the key
    cleared = updated.withColumn(
        "status", F.when(F.col("key") == tkey, F.lit(None)).otherwise(F.col("status"))
    )
    rediscovered = {r.key for r in discovery.discover_new(cleared.select("key"), cleared).collect()}
    assert tkey in rediscovered


def test_read_evolved_generations(spark, tmp_path):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.sources.listing import (
        read_evolved,
    )

    g1 = str(tmp_path / "gen1")
    g2 = str(tmp_path / "gen2")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(g1)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(g2)

    out = read_evolved(spark, [g1, g2])
    rows = {r.id: (r.name, r.score) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}

    # a type change must raise, not coerce
    g3 = str(tmp_path / "gen3")
    spark.createDataFrame([(3, 7)], "id long, name int").write.parquet(g3)
    import pytest

    with pytest.raises(TypeError, match="changed type"):
        read_evolved(spark, [g1, g3])
