package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffling fact tables into N buckets on the
  * join/aggregation key once at write time removes the exchange from every
  * subsequent join/agg on that key — the standard way to amortize shuffles
  * across a 100 TB pipeline's repeated joins.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (both sides of a future
    * join must use the same key and bucket count).
    *
    * A fresh session's catalog does not know about tables a PREVIOUS
    * session left in the warehouse directory, and `CREATE TABLE AS`
    * refuses to reuse the orphaned location — so drop the table and
    * clear its orphaned location explicitly before writing. The manual
    * cleanup only applies to an unqualified table in a local-filesystem
    * warehouse (the only case where `<warehouse>/<table>` is the actual
    * location); qualified names are rejected and non-file warehouse URIs
    * skip the cleanup rather than guess at a path. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(!table.contains("."),
      s"writeBucketed expects an unqualified table name in the current " +
        s"database (got '$table'): the orphaned-location cleanup derives " +
        s"the path as <warehouse>/<table>, which is wrong for db.tbl")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouseUri = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
    if (warehouseUri.getScheme == null || warehouseUri.getScheme == "file") {
      val loc = new java.io.File(warehouseUri.getPath, table)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    // Pre-shuffle onto the bucket partitioning before writing: repartition
    // by the key expression uses the same Murmur3 `hash(key) pmod n` that
    // the bucketed writer assigns bucket ids with, so each write task holds
    // exactly one bucket and emits exactly one file. Without this, every
    // input task writes a file for every bucket it touches — tasks×buckets
    // small files, which at 100 TB turns the downstream one-task-per-bucket
    // scan into a many-small-file merge. The shuffle is the point: a
    // bucketed layout pays its shuffle once, at write time.
    df.repartition(buckets, df.col(key))
      .write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-key bucketed tables — planner sees the bucketing output
    * partitioning and elides both exchanges (verify via
    * `spark.sql.sources.bucketing.enabled`, on by default). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
