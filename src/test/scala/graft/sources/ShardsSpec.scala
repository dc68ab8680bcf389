package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")

  test("shardAssign is uniform-ish and consistent with sortKey") {
    val got = Shards.shardAssign(corpus).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("sort_key"), r.getAs[Long]("shard")))
    assert(got.length == 500)
    got.foreach { case (_, k, s) => assert(s == k % 8 && s >= 0 && s < 8) }
    val sizes = got.groupBy(_._3).view.mapValues(_.size)
    assert(sizes.size == 8)
    assert(sizes.values.max <= 3 * sizes.values.min) // hash spread, no empty shard
  }

  test("writeShards: hive shard dirs, sorted within, deterministic") {
    val dir = Files.createTempDirectory("graft_shards").toString
    Shards.writeShards(corpus, dir)

    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).sorted
    assert(shardDirs.length == 8)

    val expected = Shards.shardAssign(corpus).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("sort_key"), r.getAs[Long]("shard")))
    val wantByShard = expected.groupBy(_._3).view
      .mapValues(_.sortBy(t => (t._2, t._1)).map(_._1).toSeq).toMap

    shardDirs.foreach { d =>
      val shard = d.getName.stripPrefix("shard=").toLong
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"one file per shard task: ${files.length}")
      // read the single file directly: row order is the write order
      val ids = spark.read.parquet(files.head.getPath)
        .select("doc_id").as[Long].collect().toSeq
      assert(ids == wantByShard(shard), s"shard $shard order/content")
    }

    // rerun writes byte-stable content: same per-shard id sequences
    val dir2 = Files.createTempDirectory("graft_shards2").toString
    Shards.writeShards(corpus, dir2)
    shardDirs.foreach { d =>
      val n = d.getName
      val a = spark.read.parquet(s"$dir/$n").select("doc_id").as[Long].collect().toSeq.sorted
      val b = spark.read.parquet(s"$dir2/$n").select("doc_id").as[Long].collect().toSeq.sorted
      assert(a == b)
    }
  }

  test("a surviving doc keeps its shard when the corpus grows") {
    val grown = (0L until 800L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val small = Shards.shardAssign(corpus).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("shard")).toMap
    val big = Shards.shardAssign(grown).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("shard")).toMap
    small.foreach { case (id, s) => assert(big(id) == s) }
  }

  test("shardBalance: populations sum to the corpus and skews match the formula") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, ("w " * (1 + (i % 5).toInt)).trim))
      .toSeq.toDF("doc_id", "text")
    val rows = Shards.shardBalance(docs).collect()
    val td = rows.map(_.getAs[Long]("n_docs")).sum
    val tt = rows.map(_.getAs[Long]("n_tokens")).sum
    assert(td == 40L)
    assert(tt == (0L until 40L).map(i => 1 + (i % 5)).sum)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_skew_pm") ==
        1000L * r.getAs[Long]("n_docs") * 8L / td)
      assert(r.getAs[Long]("token_skew_pm") ==
        1000L * r.getAs[Long]("n_tokens") * 8L / tt)
    }
  }
}
