package graft.sources.wire

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
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
    override def toStreaming: StreamingWrite = new WireStreamingWrite(path, schema)
  }
}

/** Streaming sink twin: each epoch's tasks write
  * `epoch-<epochId>-part-<partition>-<task>.txt` — new files per
  * micro-batch, which is exactly the contract [[WireMicroBatchStream]]
  * reads (files are immutable once written), so a wire directory can
  * be produced by one streaming query and tailed by another. At-least-
  * once: a replayed epoch overwrites its own deterministically-named
  * files rather than duplicating rows beside them. */
class WireStreamingWrite(path: String, schema: StructType) extends StreamingWrite {
  require(schema.fieldNames.toSeq == WireTable.schema.fieldNames.toSeq,
    s"graft-wire expects columns ${WireTable.schema.fieldNames.mkString(", ")}; " +
      s"got ${schema.fieldNames.mkString(", ")}")
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = new WireStreamingWriterFactory(path)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

class WireStreamingWriterFactory(path: String) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    // name by (epoch, partition) ONLY — task ids change across retry
    // attempts, and the replay-overwrites-itself guarantee needs the
    // retried attempt to land on the same file
    new WireWriter(path, f"epoch-$epochId-part-$partitionId%05d.txt")
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
    new WireWriter(path, f"part-$partitionId%05d-$taskId.txt")
}

class WireWriter(dir: String, fileName: String)
    extends DataWriter[InternalRow] {

  private val file = new Path(dir, fileName)
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
