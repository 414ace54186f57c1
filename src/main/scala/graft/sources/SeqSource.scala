package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 (SURVEY §2.1 S6): the reference ingests market
  * rows per ticker over HTTP (webscrapping.py's per-symbol fetch loop);
  * the Spark-native shape for that is a pluggable connector whose
  * InputPartitions are the per-shard fetches — each partition pulls its
  * slice independently on an executor, so ingestion parallelism is plan-
  * controlled instead of a driver-side loop.
  *
  * This implementation generates a deterministic sequence (so correctness
  * is oracle-checkable) through the full V2 read stack: TableProvider →
  * Table(SupportsRead) → ScanBuilder → Batch → InputPartition[] →
  * PartitionReaderFactory. Swapping the reader's row generator for an
  * HTTP call is the production path; everything else stays identical.
  *
  * Usage: `spark.read.format("graft.sources.SeqSource")
  *   .option("rows", n).option("slices", k).load()`
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SeqTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("slices", "8").toInt)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false)))

  /** Deterministic row content shared by reader and tests. */
  def symbolOf(id: Long): String = "S" + (id % 84)
  def priceOf(id: Long): Double = (id % 997) * 0.37
}

private class SeqTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = SeqSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1L, (rows + slices - 1) / slices)
        (0L until rows by per)
          .map(start => SeqPartition(start, math.min(start + per, rows)))
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new SeqReaderFactory
    }
}

private case class SeqPartition(start: Long, end: Long) extends InputPartition

private class SeqReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        cur, UTF8String.fromString(SeqSource.symbolOf(cur)), SeqSource.priceOf(cur)))
      override def close(): Unit = ()
    }
  }
}
