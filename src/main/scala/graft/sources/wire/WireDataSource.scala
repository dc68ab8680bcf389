package graft.sources.wire

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's ` /TLOC/ ` metric wire
  * format (`tag /TLOC/ score /TLOC/ type /TLOC/ country`,
  * KafkaSparkProcessor.scala:232-245) — the ingest wire as a
  * first-class Spark table instead of a parse-it-yourself text file:
  *
  *   spark.read.format("graft-wire").load(dir)
  *
  * Spark-native behaviors a hand-rolled `spark.read.text` + split
  * chain does NOT get:
  *   - COLUMN PRUNING pushed into the parser: `select(hashtag)` makes
  *     each reader materialize one slot of the split — the other three
  *     are never converted (`SupportsPushDownRequiredColumns`);
  *   - FILTER PUSHDOWN: string-equality predicates evaluate inside the
  *     reader on the raw slots, before any row object is built
  *     (`SupportsPushDownFilters`; Spark then skips re-evaluating
  *     them post-scan);
  *   - per-FILE input partitions through the Hadoop FS API, so the
  *     same source reads file://, hdfs:// or s3a:// (a production
  *     variant would add byte-range splits within large files —
  *     one-partition-per-file is the floor, not the ceiling).
  *
  * Decode semantics are bit-identical to the column-form
  * [[graft.model.WireCodec.decodeMetric]] twin (the spec proves it):
  * missing slots → NULL, non-numeric score → NULL (one bad record
  * must not fail a 100 TB job), `split` keeps trailing empty slots.
  */
class WireDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-wire"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WireTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new WireTable(properties.get("path"))
}

object WireTable {
  val Delim = " /TLOC/ "
  val schema: StructType = StructType(Seq(
    StructField("hashtag", StringType),
    StructField("sentiment_score", DoubleType),
    StructField("sentiment_type", StringType),
    StructField("country", StringType)))
  private[wire] val ScoreRe =
    "^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$".r.pattern
}

class WireTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graft-wire requires a path: .load(<dir or file>)")
  override def name(): String = s"graft-wire($path)"
  override def schema(): StructType = WireTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WireScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WireWriteBuilder(path, info.schema())
}

class WireScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = WireTable.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept string-equality filters on wire columns; everything else is
    * returned for Spark to evaluate post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case EqualTo(a, _: String) =>
        WireTable.schema.fieldNames.contains(a) && a != "sentiment_score"
      case _ => false
    }
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new WireScan(path, required, pushed)
}

final case class WireFilePartition(file: String) extends InputPartition

class WireScan(path: String, required: StructType, val pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WireMicroBatchStream(path, required, pushed)

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
          .map(_.getPath.toString).sorted
      else Array(path)
    files.map(f => WireFilePartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WireReaderFactory(required.fieldNames,
      pushed.map { case EqualTo(a, v: String) => (a, v) })
}

class WireReaderFactory(columns: Array[String], eqFilters: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WireReader(partition.asInstanceOf[WireFilePartition].file, columns, eqFilters)
}

/** Line-at-a-time reader: split, filter on raw slots, convert only the
  * pruned columns. */
class WireReader(file: String, columns: Array[String],
                 eqFilters: Array[(String, String)])
    extends PartitionReader[InternalRow] {

  private val slotOf = Map("hashtag" -> 0, "sentiment_score" -> 1,
    "sentiment_type" -> 2, "country" -> 3)
  private val outSlots = columns.map(slotOf)
  private val filterSlots = eqFilters.map { case (a, v) => (slotOf(a), v) }

  private val in = {
    val p = new Path(file)
    new java.io.BufferedReader(new java.io.InputStreamReader(
      p.getFileSystem(new Configuration()).open(p), "UTF-8"))
  }
  private var row: InternalRow = _

  private def slot(parts: Array[String], i: Int): String =
    if (i < parts.length) parts(i) else null

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      val parts = line.split(WireTable.Delim, -1)
      val pass = filterSlots.forall { case (i, v) => v == slot(parts, i) }
      if (pass) {
        val values = new Array[Any](outSlots.length)
        var j = 0
        while (j < outSlots.length) {
          val s = slot(parts, outSlots(j))
          values(j) = outSlots(j) match {
            case 1 =>
              if (s != null && WireTable.ScoreRe.matcher(s).matches())
                java.lang.Double.valueOf(s.toDouble)
              else null
            case _ => if (s == null) null else UTF8String.fromString(s)
          }
          j += 1
        }
        row = new GenericInternalRow(values)
        return true
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
