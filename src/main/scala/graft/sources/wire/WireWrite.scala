package graft.sources.wire

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** Batch write side of the ` /TLOC/ ` wire source:
  * `df.write.format("graft-wire").mode("append").save(dir)`.
  *
  * Encode semantics are [[graft.model.WireCodec.encodeMetric]]'s:
  * every slot is null-coalesced to "" so the delimiter count is always
  * 3 and a decoder can never mis-slot a field (the reference producer's
  * null-location hazard, KafkaTwitterProducer.java:102). Scores print
  * via Java's Double.toString — the same rendering Spark's
  * cast(string) uses, so encode(decode(x)) is stable.
  *
  * Each task streams its partition straight to one
  * `part-<partition>-<task>.txt` through the Hadoop FS API (file://,
  * hdfs://, s3a://) — no driver funnel, no buffering of the partition
  * in memory; commit is per-file and abort deletes the file, giving
  * task-retry safety without a rename protocol (a production variant
  * would stage to a temp dir and rename on job commit). */
class WireWriteBuilder(path: String, schema: StructType) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new WireBatchWrite(path, schema)
  }
}

final case class WireCommit(file: String) extends WriterCommitMessage

class WireBatchWrite(path: String, schema: StructType) extends BatchWrite {
  require(schema.fieldNames.toSeq == WireTable.schema.fieldNames.toSeq,
    s"graft-wire expects columns ${WireTable.schema.fieldNames.mkString(", ")}; " +
      s"got ${schema.fieldNames.mkString(", ")}")
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new WireWriterFactory(path)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class WireWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WireWriter(path, partitionId, taskId)
}

class WireWriter(dir: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val file = new Path(dir, f"part-$partitionId%05d-$taskId.txt")
  private val fs = file.getFileSystem(new Configuration())
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(file, true), "UTF-8"))

  private def s(row: InternalRow, i: Int): String =
    if (row.isNullAt(i)) "" else row.getUTF8String(i).toString
  private def d(row: InternalRow, i: Int): String =
    if (row.isNullAt(i)) "" else java.lang.Double.toString(row.getDouble(i))

  override def write(row: InternalRow): Unit = {
    out.write(s(row, 0)); out.write(WireTable.Delim)
    out.write(d(row, 1)); out.write(WireTable.Delim)
    out.write(s(row, 2)); out.write(WireTable.Delim)
    out.write(s(row, 3))
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = { out.close(); WireCommit(file.toString) }
  override def abort(): Unit = { out.close(); fs.delete(file, false); () }
  override def close(): Unit = ()
}
