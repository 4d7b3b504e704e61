package graft.compiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Measured table statistics: row count + estimated in-memory data size.
  *
  * These exist to close the statistics → plan-choice loop for the SQL
  * session's broadcast-join decision (ANALYZE in Executor, hint
  * injection in Compiler.compileRelation). Catalyst's own static
  * estimates are blind exactly where a session catalog lives:
  *
  *  - a CTAS scope entry is a computed plan — its `sizeInBytes` is the
  *    PRODUCT-style propagation of its inputs (a join estimate is
  *    left×right), so a 30-row derived dimension can look terabyte-sized
  *    and a broadcastable join plans as shuffle;
  *  - a small parquet table's file size is dominated by footer/metadata
  *    overhead, overstating a few hundred bytes of data several-fold.
  *
  * A measured count fixes both. At 100 TB this is exactly how real
  * warehouses drive join strategy: ANALYZE writes stats once (one
  * map-side-combined aggregate pass, a few bytes per partition shipped),
  * and every later compile reads them for free.
  */
final case class TableStats(rows: Long, sizeBytes: Long)

object TableStats {

  /** Fixed in-memory width of a primitive column value (UnsafeRow word
    * sizes, close enough for a broadcast decision). */
  private def fixedWidth(dt: DataType): Option[Long] = dt match {
    case BooleanType | ByteType => Some(1L)
    case ShortType => Some(2L)
    case IntegerType | FloatType | DateType => Some(4L)
    case LongType | DoubleType | TimestampType | TimestampNTZType => Some(8L)
    case _: DecimalType => Some(16L)
    case _ => None
  }

  /** Per-row byte estimate for one column, as a codegen-friendly
    * expression (no UDF): fixed widths for primitives, octet_length for
    * strings/binary, element arithmetic for arrays. Unknown nested types
    * get a flat constant — fine for an order-of-magnitude decision. */
  private def colBytes(name: String, dt: DataType): Column = dt match {
    case StringType | BinaryType =>
      coalesce(octet_length(col(name)).cast("long"), lit(0L))
    case ArrayType(et, _) => fixedWidth(et) match {
      case Some(w) =>
        coalesce(size(col(name)).cast("long") * lit(w) + lit(16L), lit(0L))
      case None => et match {
        case StringType | BinaryType => coalesce(
          aggregate(col(name), lit(0L),
            (acc, x) => acc + coalesce(octet_length(x).cast("long"), lit(0L)))
            + lit(16L),
          lit(0L))
        case _ => lit(32L)
      }
    }
    case other => fixedWidth(other).map(lit(_)).getOrElse(lit(32L))
  }

  /** ONE aggregate pass over the table: count + summed per-row width
    * (+8 bytes/row fixed overhead). Partial aggregation makes this a
    * few bytes per partition over the wire regardless of table size. */
  def compute(df: DataFrame): TableStats = {
    val perRow = df.schema.fields
      .map(f => colBytes(f.name, f.dataType))
      .foldLeft(lit(8L))(_ + _)
    val row = df.agg(
      count(lit(1)).as("rows"),
      coalesce(sum(perRow), lit(0L)).as("bytes")).head()
    TableStats(row.getLong(0), row.getLong(1))
  }
}
