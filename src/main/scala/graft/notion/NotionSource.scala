package graft.notion

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Notion ingest as a DataSourceV2 source — SURVEY §2.1 S1's "at
  * scale" note discharged: the cursor pull stops being a driver-side
  * array and becomes partition readers that STREAM pages,
  *
  * {{{
  *   spark.read.format("graft-notion")
  *     .option("datasets", "timeslices:db-1,clients:db-2")
  *     .option("adapterFactory", classOf[MyFactory].getName)
  *     .load()                          // rawRecordSchema envelope rows
  * }}}
  *
  * The honest parallelism story for a rate-limited, opaque-cursor
  * API: WITHIN one database the cursor chain is inherently
  * sequential, so its reader streams it with O(one page) memory —
  * rows flow incrementally into the scan (and whatever lands them)
  * instead of accreting on the driver; ACROSS databases, one
  * partition each, readers run concurrently under the PROCESS-SHARED
  * 3 rps limiter + retry policy ([[Ingest.processThrottled]] — the
  * same throttling discipline as the driver-side pull, now drained
  * jointly by every reader in the executor).
  *
  * The adapter reaches executors BY CLASS NAME
  * ([[NotionAdapterFactory]], no-arg constructor, resolved on the
  * executor classpath): HTTP clients and recorded-fixture fakes are
  * both process-local resources a serialized closure could not carry.
  * Every record passes the same envelope validation and property
  * re-keying as the driver path ([[Ingest.recordIterator]] is shared
  * verbatim), so the two pulls are row-identical — spec-pinned.
  */
trait NotionAdapterFactory {
  def create(): Ingest.NotionAdapter
}

class GraftNotionProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-notion"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NotionSchemas.rawRecordSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val datasets = Option(options.get("datasets")).getOrElse(
      throw new IllegalArgumentException(
        "graft-notion requires datasets: option(\"datasets\", " +
          "\"name:databaseId[,name2:databaseId2…]\")"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .map { s =>
        s.split(":", 2) match {
          case Array(n, id) if n.nonEmpty && id.nonEmpty => (n, id)
          case _ => throw new IllegalArgumentException(
            s"bad dataset spec '$s' — want name:databaseId")
        }
      }
    val factory = Option(options.get("adapterFactory")).getOrElse(
      throw new IllegalArgumentException(
        "graft-notion requires adapterFactory: the class name of a " +
          "no-arg-constructible graft.notion.NotionAdapterFactory"))
    new GraftNotionTable(datasets, factory)
  }
}

final class GraftNotionTable(datasets: Seq[(String, String)],
                             factoryClass: String)
  extends Table with SupportsRead {

  override def name(): String =
    s"graft-notion(${datasets.map(_._1).mkString(",")})"
  override def schema(): StructType = NotionSchemas.rawRecordSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = NotionSchemas.rawRecordSchema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          datasets.map(d =>
            NotionInputPartition(d._1, d._2, factoryClass): InputPartition)
            .toArray
        override def createReaderFactory(): PartitionReaderFactory =
          NotionReaderFactory
      }
    }
}

/** One dataset = one cursor stream = one partition. */
final case class NotionInputPartition(dataset: String, databaseId: String,
                                      factoryClass: String)
  extends InputPartition

object NotionReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[NotionInputPartition]
    new PartitionReader[InternalRow] {
      private val adapter = Ingest.processThrottled(
        Class.forName(part.factoryClass).getDeclaredConstructor()
          .newInstance().asInstanceOf[NotionAdapterFactory].create())
      private val records =
        Ingest.recordIterator(adapter, part.dataset, part.databaseId)
      private val serialize =
        ExpressionEncoder(NotionSchemas.rawRecordSchema).createSerializer()
      private var row: InternalRow = _
      override def next(): Boolean =
        if (!records.hasNext) false
        else { row = serialize(Ingest.rowOf(records.next())).copy(); true }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
