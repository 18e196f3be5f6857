package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Executor-side fold of one parquet file's footer into a
  * [[FileStats]] row: per-column min/max/null-count merged across row
  * groups, with writer-omitted stats surfacing as NULL ("unknown"),
  * never as a partial fold. See [[FileStats.collectFooters]] for the
  * contract; this object holds only the serializable task-side logic.
  */
private[graft] object FooterStats {

  def supported(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Natural ordering on the JVM-side stat values per Spark type. */
  private def lessThan(dt: DataType, a: Any, b: Any): Boolean = dt match {
    case BooleanType => !a.asInstanceOf[Boolean] && b.asInstanceOf[Boolean]
    case IntegerType => a.asInstanceOf[Int] < b.asInstanceOf[Int]
    case LongType    => a.asInstanceOf[Long] < b.asInstanceOf[Long]
    case FloatType   => a.asInstanceOf[Float] < b.asInstanceOf[Float]
    case DoubleType  => a.asInstanceOf[Double] < b.asInstanceOf[Double]
    case StringType  =>
      // UNSIGNED UTF-8 BYTE order — parquet's binary stat ordering and
      // Spark's own UTF8String comparison. Java String '<' (UTF-16
      // code-unit order) disagrees for supplementary characters vs
      // [U+E000, U+FFFF]: a surrogate pair (code point > U+10000)
      // sorts BELOW '' by code unit but ABOVE it by byte — a
      // cross-row-group fold under the wrong order understates the
      // max, and an envelope consumer then proves exclusions (or
      // whole-file matches) that delete/skip real rows.
      java.util.Arrays.compareUnsigned(
        a.asInstanceOf[String].getBytes(
          java.nio.charset.StandardCharsets.UTF_8),
        b.asInstanceOf[String].getBytes(
          java.nio.charset.StandardCharsets.UTF_8)) < 0
    case DateType =>
      a.asInstanceOf[java.sql.Date].toLocalDate
        .isBefore(b.asInstanceOf[java.sql.Date].toLocalDate)
    case TimestampType =>
      a.asInstanceOf[java.sql.Timestamp]
        .before(b.asInstanceOf[java.sql.Timestamp])
    case TimestampNTZType =>
      a.asInstanceOf[java.time.LocalDateTime]
        .isBefore(b.asInstanceOf[java.time.LocalDateTime])
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  /** Parquet stat value → the Spark EXTERNAL type `createDataFrame`
    * expects for `dt`. Timestamp unit comes from the column's logical
    * annotation (MICROS or MILLIS; NANOS is rejected the same way
    * Spark's own reader rejects it). Returns None when the physical/
    * logical shape doesn't match `dt` — fold treats that as unknown. */
  private def convert(dt: DataType, v: Any,
                      ann: LogicalTypeAnnotation): Option[Any] = (dt, v) match {
    case (BooleanType, b: java.lang.Boolean) => Some(b.booleanValue)
    case (IntegerType, i: java.lang.Integer) => Some(i.intValue)
    case (LongType, l: java.lang.Long)       => Some(l.longValue)
    case (FloatType, f: java.lang.Float)     => Some(f.floatValue)
    case (DoubleType, d: java.lang.Double)   => Some(d.doubleValue)
    case (StringType, b: Binary)             => Some(b.toStringUsingUTF8)
    case (DateType, i: java.lang.Integer) =>
      Some(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue)))
    case (TimestampType | TimestampNTZType, l: java.lang.Long) =>
      micros(ann, l.longValue).map { us =>
        if (dt == TimestampType) {
          val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          t
        } else
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
      }
    case _ => None
  }

  private def micros(ann: LogicalTypeAnnotation, raw: Long): Option[Long] = {
    import LogicalTypeAnnotation.TimeUnit
    ann match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        t.getUnit match {
          case TimeUnit.MICROS => Some(raw)
          case TimeUnit.MILLIS => Some(Math.multiplyExact(raw, 1000L))
          case _               => None // NANOS: Spark 4 rejects the column too
        }
      case _ => None
    }
  }

  /** One file → one stats Row. Opens only the footer. */
  def fileRow(path: String, conf: Configuration,
              colTypes: Seq[(String, DataType)]): Row = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      val perCol = colTypes.flatMap { case (c, dt) =>
        var mn: Option[Any] = None
        var mx: Option[Any] = None
        var nulls = 0L
        var known = true // false once any row group's stats are unusable
        blocks.filter(_.getRowCount > 0).foreach { bg =>
          bg.getColumns.asScala
            .find(_.getPath.toDotString == c) match {
            case None => known = false
            case Some(cc) =>
              val st = cc.getStatistics
              val ann = cc.getPrimitiveType.getLogicalTypeAnnotation
              if (st == null || !st.isNumNullsSet) known = false
              else {
                nulls += st.getNumNulls
                if (st.hasNonNullValue) {
                  (convert(dt, st.genericGetMin, ann),
                    convert(dt, st.genericGetMax, ann)) match {
                    case (Some(lo), Some(hi)) =>
                      if (mn.forall(m => lessThan(dt, lo, m))) mn = Some(lo)
                      if (mx.forall(m => lessThan(dt, m, hi))) mx = Some(hi)
                    case _ => known = false
                  }
                } else if (st.getNumNulls != bg.getRowCount)
                  known = false // no values recorded yet not all-null
              }
          }
        }
        if (known) Seq(mn.orNull, mx.orNull, nulls)
        else Seq(null, null, null)
      }
      Row.fromSeq(path +: rowCount +: perCol)
    } finally reader.close()
  }
}
