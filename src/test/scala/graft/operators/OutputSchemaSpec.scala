package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.types._

/** Pins every registered query's EMITTED schema to the hash-stable type
  * set — the types the driver's dtype-sensitive hasher has proven it
  * normalizes identically from Spark parquet and DuckDB output. The r12
  * red row (`sim_dim_stats`) was exactly this failure class: an
  * overflow fix switched a sum column to DECIMAL(38,0), values stayed
  * numerically identical, the local loose-dtype oracle check stayed
  * green, and the driver's hash went red. This spec turns any future
  * type-changing edit into a local red bar instead of a round-end
  * driver surprise.
  *
  * Allowed: the integral family (byte/short/int/long all arrive as
  * plain integers on both engines), double, string, boolean, date, and
  * arrays/structs thereof. Excluded on purpose: DECIMAL (the r12
  * failure), FLOAT (single-precision round-trips differently through
  * pandas), TIMESTAMP (parquet flavor varies by writer — the repo
  * convention is epoch longs or date strings, see Verify skill notes),
  * MAP (iteration order is not canonical across engines), BINARY
  * (DuckDB renders blobs, pandas bytes — never emitted; payloads stay
  * internal to mm_* plumbing).
  */
class OutputSchemaSpec extends SparkSuite {

  private def stable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case DoubleType => true
    case StringType => true
    case BooleanType => true
    case DateType => true
    case ArrayType(et, _) => stable(et)
    case StructType(fields) => fields.forall(f => stable(f.dataType))
    case _ => false
  }

  test("every query emits only hash-stable column types") {
    val bad = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, sf0001).schema
        spark.catalog.clearCache()
        graft.CheckpointUtil.releaseStragglers()
        schema.fields.collect {
          case f if !stable(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(bad.isEmpty,
      s"non-hash-stable output columns (driver-gate risk): ${bad.mkString("; ")}")
  }
}
