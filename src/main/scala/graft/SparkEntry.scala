package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.Fixtures
import graft.functions.GraftFunctions._
import graft.operators.SpatialJoin
import graft.oracle.Derive

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` = the flagship query (SURVEY.md §7 step 3): spatial join of the
  * image table (locations derived from phash) against the polygon extent
  * set, plus web-tile assignment. `queries`/`oracleSql` = per-operator
  * DuckDB-checked twins over the driver testdata tables.
  */
object SparkEntry {
  /** Flagship on generated sf0.001-scale fixtures; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val imgs = Fixtures.images(spark, 10000)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))
    val joined = SpatialJoin.join(spark, imgs, col("lon"), col("lat"), Fixtures.polygons)
    SpatialJoin.assignTiles(joined, col("lon"), col("lat"), 12)
      .select("image_id", "poly_id", "tile_z", "tile_x", "tile_y")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C2: many-polygon spatial join (cover-cell equi-join + raycast refine)
    "q01_spatial_join" -> ((s, dir) => {
      val pts = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"),
          Derive.lonMicro(col("c_custkey")).as("lonm"),
          Derive.latMicro(col("c_custkey")).as("latm"))
      SpatialJoin.join(s, pts, col("lonm"), col("latm"), Derive.rectSpecs)
        .select("c_custkey", "poly_id")
        .orderBy("c_custkey", "poly_id")
    }),
    // C5: raster↔vector tile assignment (equirect, integer-exact)
    "q02_tile_assign" -> ((s, dir) => {
      val pts = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"),
          Derive.lonMicro(col("o_orderkey")).as("lonm"),
          Derive.latMicro(col("o_orderkey")).as("latm"))
      SpatialJoin.assignTiles(pts, col("lonm"), col("latm"), 8)
        .select("o_orderkey", "tile_z", "tile_x", "tile_y")
        .orderBy("o_orderkey")
    }),
    // H5: zcell encoding + cell-keyed aggregation (the scan-pruning key)
    "q03_zcell_count" -> ((s, dir) => {
      val pts = s.read.parquet(s"$dir/customer.parquet")
        .select(Derive.lonMicro(col("c_custkey")).as("lonm"),
          Derive.latMicro(col("c_custkey")).as("latm"))
      pts.select(zcell(col("lonm"), col("latm"), 12).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("n_points"))
        .orderBy("cell")
    }))

  /** DuckDB twins (same table names = parquet basenames in sfDir). */
  def oracleSql: Map[String, String] = Map(
    "q01_spatial_join" ->
      s"""SELECT c.c_custkey AS c_custkey, r.poly_id AS poly_id
         |FROM customer c JOIN ${Derive.rectsSqlValues}
         |ON ${Derive.lonSql("c.c_custkey")} BETWEEN r.lon_min AND r.lon_max
         |AND ${Derive.latSql("c.c_custkey")} BETWEEN r.lat_min AND r.lat_max
         |ORDER BY c_custkey, poly_id""".stripMargin,
    "q02_tile_assign" ->
      s"""WITH pts AS (SELECT o_orderkey, ${Derive.lonSql("o_orderkey")} AS lonm,
         |  ${Derive.latSql("o_orderkey")} AS latm FROM orders)
         |SELECT o_orderkey, 8 AS tile_z,
         |  ((lonm + 180000000) * 256) // 360000000 AS tile_x,
         |  ((90000000 - latm) * 256) // 180000000 AS tile_y
         |FROM pts ORDER BY o_orderkey""".stripMargin,
    "q03_zcell_count" ->
      s"""WITH pts AS (SELECT ${Derive.lonSql("c_custkey")} AS lonm,
         |  ${Derive.latSql("c_custkey")} AS latm FROM customer),
         |${Derive.zcellSqlCte(12)}
         |SELECT cell, count(*) AS n_points FROM zc GROUP BY cell ORDER BY cell""".stripMargin)
}
