package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampType}

/** Shared helpers for loading the driver's parquet tables and for the
  * determinism conventions every oracle-checked query follows (SURVEY §2.3):
  *   - total deterministic ORDER BY on a unique key;
  *   - double aggregates summed as DECIMAL(18,6) then cast back to DOUBLE.
  *
  * Why decimal sums: double addition is order-dependent, and Spark's
  * partition-parallel aggregation does not fix an order. Decimal addition is
  * exact, so the sum is independent of partitioning, and DuckDB computes the
  * identical value. The double→decimal(…,6) cast itself is deterministic
  * across engines because a tie at the rounding digit would require a double
  * exactly equal to a scale-7 decimal ending in 5 — impossible in binary
  * floating point (the denominator would need a factor of 5^7).
  */
object Tables {
  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Row count of a fixture table from parquet FOOTER metadata — a
    * driver-side read of each file's footer (row counts are recorded per
    * row group), NO Spark job. Memoized per path for the session. Used by
    * queries that need the corpus size to derive adaptive knobs (the
    * knn-family cell counts) WITHOUT running an eager count() action at
    * query-construction time (review r13 nit: three full-scan count()s
    * per run). O(#files) driver IO — the same listing a scan performs. */
  def parquetRowCount(spark: SparkSession, sfDir: String, name: String): Long =
    rowCountCache.computeIfAbsent(s"$sfDir/$name.parquet", { path =>
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(f =>
            f.isFile && f.getPath.getName.endsWith(".parquet"))
        else Array(fs.getFileStatus(p))
      java.lang.Long.valueOf(files.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum)
    })

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) and
      // TIMESTAMP(MICROS) across driver fixture regenerations, so the load
      // path branches on the schema Spark actually infers instead of
      // assuming either encoding:
      //  - NANOS: Spark has no nanosecond timestamp type; with the legacy
      //    flag it surfaces as a nanos Long, which we truncate to micros.
      //    DIV is exact integer division (a double division would lose
      //    precision above 2^53 ns); DuckDB performs the same truncation
      //    when it narrows nanos to its micros timestamp, so oracles agree.
      //  - MICROS without isAdjustedToUTC: Spark infers TIMESTAMP_NTZ;
      //    cast to the session timestamp type (sessions pin UTC, so the
      //    wall clock — and every date_format/window oracle — is unchanged).
      //  - MICROS adjusted to UTC: already TimestampType; cast is a no-op.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** The ONE code site for the events-`ts` encoding branch, shared by the
    * batch load ([[t]]) and the streaming source
    * (`graft.streaming.EventStreams.readEventStream`): a nanos Long (the
    * NANOS fixture under the legacy flag) is integer-truncated to micros;
    * anything else (NTZ or UTC micros) is cast to the session timestamp
    * type. Caller must have set `spark.sql.legacy.parquet.nanosAsLong`
    * before reading the schema. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _        => df.withColumn("ts", col("ts").cast(TimestampType))
    }

  /** DECIMAL(18,6) entry cast for double measures (TPC-H-ish magnitudes). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Rescale an exact decimal aggregate to scale 6 and cast to DOUBLE.
    * The scale-6 step is load-bearing: decimal→double conversion is only
    * engine-identical when the unscaled value fits in 2^53 (one exact
    * int→double conversion + one correctly-rounded division by 10^6).
    * Higher-scale decimals (e.g. the scale-12 disc_price sum) take
    * different multi-rounding paths in Spark (BigDecimal) vs DuckDB
    * (int128/10^s) and can differ by 1 ulp. */
  def decOut(c: Column): Column = c.cast(DecimalType(28, 6)).cast("double")

  /** Exact, partition-order-independent sum of a double measure → DOUBLE. */
  def dsum(c: Column): Column = decOut(sum(dec(c)))

  /** Exact average: decimal sum cast double / count — identical operand
    * conversions and one IEEE division in both engines. */
  def davg(c: Column): Column = decOut(sum(dec(c))) / count(lit(1))
}
