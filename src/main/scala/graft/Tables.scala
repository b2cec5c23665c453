package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated corpus (TESTDATA.md / FIXTURES.md).
  *
  * One parquet file per table under an sf directory. The reference
  * (ispras/pu4spark) has no I/O layer of its own — ingestion is the
  * caller's job (reference README.md:74-77) — so this is the rebuild's
  * single, Parquet-native ingestion seam. Scans are plain
  * `spark.read.parquet`, so Catalyst predicate pushdown / column
  * pruning / partition pruning all apply to anything built on top.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp columns whose parquet physical type has varied across
    * driver-generator versions: TIMESTAMP(NANOS) (surfaced as LongType
    * nanos-since-epoch under `spark.sql.legacy.parquet.nanosAsLong=true` —
    * Spark 4 rejects NANOS outright otherwise), and timestamp[us] with
    * isAdjustedToUTC=false (surfaced as TIMESTAMP_NTZ). Functions like
    * `unix_micros` only accept TIMESTAMP, so both flavors are normalized
    * to TimestampType here — the session timezone is pinned UTC everywhere
    * (Verify/Bench/localSession), making the NTZ→LTZ cast exact and
    * engine-parity-safe (DuckDB reads the same field values).
    */
  private val tsColumns = Set("ts", "o_orderdate", "l_shipdate")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$sfDir/$table.parquet")
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      if (tsColumns.contains(f.name) && f.dataType == LongType)
        // `div` = integer division. `/` would be DOUBLE division: epoch
        // nanos (~1.7e18) exceed double's 2^53 mantissa, silently
        // corrupting timestamps by hundreds of microseconds.
        df.withColumn(f.name, org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr(s"${f.name} div 1000")))
      else if (tsColumns.contains(f.name) && f.dataType == TimestampNTZType)
        df.withColumn(f.name, df.col(f.name).cast(TimestampType))
      else df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Local session for tests / ad-hoc runs. Verify/Bench build their own
    * (driver contract); this one matches their config knobs.
    */
  def localSession(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // same stock coalescing floor + pinned-spread policy as Bench (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCED", "1m"))
      // AQE runtime SMJ->SHJ conversion: DEFAULT OFF ("0" = stock) — see
      // Bench.scala for the r17 A/B that retired the r16 128m setting.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "0"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Fail LOUDLY if any generated code stops compiling (e.g. a kernel
      // reference Janino can't resolve) instead of silently downgrading the
      // whole stage to interpreted execution. Round-1 shipped exactly that
      // silent downgrade; this keeps it from coming back.
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
