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
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WireScanBuilder(path,
      options.getLong("maxSplitBytes", 128L * 1024 * 1024))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WireWriteBuilder(path, info.schema())
}

class WireScanBuilder(path: String, maxSplitBytes: Long) extends ScanBuilder
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

  override def build(): Scan = new WireScan(path, required, pushed, maxSplitBytes)
}

/** A byte range of one file. A line belongs to the split holding its
  * FIRST byte: readers past offset 0 skip to the next line start, and
  * every reader finishes the line it is inside when the range ends —
  * the standard splittable-text contract, so ranges tile a file with
  * no loss and no double-read. */
final case class WireFilePartition(file: String, start: Long = 0L,
                                   length: Long = Long.MaxValue)
    extends InputPartition

class WireScan(path: String, required: StructType, val pushed: Array[Filter],
               maxSplitBytes: Long = 128L * 1024 * 1024)
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
          .map(s => (s.getPath.toString, s.getLen)).sortBy(_._1)
      else Array((path, fs.getFileStatus(p).getLen))
    files.flatMap { case (f, len) =>
      // large files split into byte ranges — at 100 TB the unit of
      // parallelism must be the byte range, not the file
      (0L until math.max(len, 1L) by maxSplitBytes).map(off =>
        WireFilePartition(f, off, math.min(maxSplitBytes, len - off))
          : InputPartition)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WireReaderFactory(required.fieldNames,
      pushed.map { case EqualTo(a, v: String) => (a, v) })
}

class WireReaderFactory(columns: Array[String], eqFilters: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WireFilePartition]
    new WireReader(p, columns, eqFilters)
  }
}

/** Byte-counting line reader over a seekable Hadoop stream —
  * `BufferedReader.readLine` hides byte positions (multi-byte UTF-8),
  * and the split contract is defined in BYTES. */
private[wire] class ByteLineReader(in: java.io.InputStream) {
  private val buf = new Array[Byte](64 * 1024)
  private var len = 0
  private var pos = 0
  private val line = new java.io.ByteArrayOutputStream(256)
  /** Bytes consumed so far, including each line's newline. */
  var bytePos: Long = 0L

  /** Next line (without newline), or null at EOF. A final unterminated
    * line is returned. */
  def readLine(): String = {
    line.reset()
    var sawAny = false
    while (true) {
      if (pos >= len) {
        len = in.read(buf); pos = 0
        if (len <= 0)
          return if (sawAny) line.toString("UTF-8") else null
      }
      var i = pos
      while (i < len && buf(i) != '\n') i += 1
      line.write(buf, pos, i - pos)
      sawAny = sawAny || i > pos
      if (i < len) { // consumed the newline
        bytePos += (i - pos) + 1
        pos = i + 1
        return line.toString("UTF-8")
      }
      bytePos += i - pos
      pos = i
    }
    null // unreachable
  }
}

/** Range reader: seeks to the split start, skips the partial line
  * (owned by the previous split), emits every line STARTING inside
  * [start, start+length), finishing the last line past the boundary. */
class WireReader(part: WireFilePartition, columns: Array[String],
                 eqFilters: Array[(String, String)])
    extends PartitionReader[InternalRow] {

  private val slotOf = Map("hashtag" -> 0, "sentiment_score" -> 1,
    "sentiment_type" -> 2, "country" -> 3)
  private val outSlots = columns.map(slotOf)
  private val filterSlots = eqFilters.map { case (a, v) => (slotOf(a), v) }

  private val stream = {
    val p = new Path(part.file)
    val s = p.getFileSystem(new Configuration()).open(p)
    if (part.start > 0) s.seek(part.start)
    s
  }
  private val lines = new ByteLineReader(stream)
  private val splitLen =
    if (part.length == Long.MaxValue) Long.MaxValue
    else part.length
  // a reader starting mid-file does not own the line it landed in
  if (part.start > 0) lines.readLine()

  private var row: InternalRow = _

  private def slot(parts: Array[String], i: Int): String =
    if (i < parts.length) parts(i) else null

  // Ownership uses the Hadoop LineRecordReader convention: a non-first
  // split ALWAYS skips the line it seeks into, and the previous split
  // compensates by also emitting a line that starts EXACTLY on the
  // boundary (<=, not <) — so a newline falling as a split's last byte
  // loses nothing: the line after it is read by the earlier split and
  // skipped by the later one.
  override def next(): Boolean = {
    while (lines.bytePos <= splitLen) {
      val line = lines.readLine()
      if (line == null) return false
      val parts = line.split(WireTable.Delim, -1)
      if (filterSlots.forall { case (i, v) => v == slot(parts, i) }) {
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
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = stream.close()
}
