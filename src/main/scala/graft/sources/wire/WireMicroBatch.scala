package graft.sources.wire

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.StructType

/** Streaming read of the wire directory — the reference's "tail the
  * Kafka topic" ingest re-expressed as a Structured Streaming source:
  * each micro-batch processes the files that appeared since the last
  * committed offset.
  *
  * The offset is the SET of processed file names (JSON array in the
  * checkpoint). File content is assumed immutable once written —
  * the standard contract of log-structured ingest directories; a
  * producer appends NEW files (as [[WireWriter]] does) rather than
  * appending to old ones. Batches replay deterministically: the same
  * (start, end) offset pair always yields the same file set, so
  * recovery after failure reprocesses exactly the uncommitted batch.
  * Column pruning and pushed filters ride along unchanged — each
  * file becomes the same [[WireReader]] the batch path uses. */
class WireMicroBatchStream(path: String, required: StructType,
                           pushed: Array[Filter]) extends MicroBatchStream {

  private def listFiles(): Set[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) Set.empty
    else if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        .map(_.getPath.toString).toSet
    else Set(path)
  }

  override def initialOffset(): Offset = WireOffset(Set.empty)
  override def latestOffset(): Offset = WireOffset(listFiles())
  override def deserializeOffset(json: String): Offset = WireOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val done = start.asInstanceOf[WireOffset].files
    val now = end.asInstanceOf[WireOffset].files
    (now -- done).toArray.sorted.map(f => WireFilePartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WireReaderFactory(required.fieldNames,
      pushed.map { case EqualTo(a, v: String) => (a, v) })
}

/** Offset = processed file set, serialized as a JSON string array. */
final case class WireOffset(files: Set[String]) extends Offset {
  override def json(): String =
    files.toSeq.sorted
      .map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object WireOffset {
  def fromJson(json: String): WireOffset = {
    // minimal JSON string-array parse (inverse of json() above)
    val trimmed = json.trim.stripPrefix("[").stripSuffix("]")
    if (trimmed.isEmpty) WireOffset(Set.empty)
    else {
      val out = Seq.newBuilder[String]
      val sb = new StringBuilder
      var inStr = false
      var esc = false
      trimmed.foreach { c =>
        if (esc) { sb.append(c); esc = false }
        else if (c == '\\' && inStr) esc = true
        else if (c == '"') { if (inStr) { out += sb.result(); sb.clear() }; inStr = !inStr }
        else if (inStr) sb.append(c)
      }
      WireOffset(out.result().toSet)
    }
  }
}
