package graft.llm

import graft.SparkSpec

/** Sequence packing: invariants plus a hand-checked tiny corpus. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c"),           // 3 tokens, span [0, 3)
    (2L, "d e f g h"),       // 5 tokens, span [3, 8)
    (3L, ""),                // empty — contributes nothing
    (5L, "i j"),             // 2 tokens, span [8, 10)
    (9L, "k l m n")          // 4 tokens, span [10, 14)
  ).toDF("doc_id", "text")

  test("capacity-4 packing on a hand-checked corpus") {
    val got = Packing.packSequences(docs, capacity = 4, bucketSize = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2))
      .toSeq
    // token stream: a b c | d e f g h | i j | k l m n  (14 tokens)
    // packs of 4:  [a b c d] [e f g h] [i j k l] [m n]
    assert(got == Seq(
      (0L, 1L, 1L, 3L, "a b c"),
      (0L, 2L, 1L, 1L, "d"),
      (1L, 2L, 2L, 4L, "e f g h"),
      (2L, 5L, 1L, 2L, "i j"),
      (2L, 9L, 1L, 2L, "k l"),
      (3L, 9L, 3L, 2L, "m n")))
  }

  test("every pack but the last is exactly full; doc segments tile the doc") {
    val corpus = (0L until 200L).map(i =>
      (i * 3L, Seq.fill((i % 7L).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val packs = Packing.packSequences(corpus, capacity = 16, bucketSize = 32L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val byPack = packs.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val lastPack = byPack.keys.max
    byPack.foreach { case (pid, tok) =>
      if (pid != lastPack) assert(tok == 16L, s"pack $pid has $tok tokens")
    }
    val total = (0L until 200L).map(i => (i % 7L) + 1).sum
    assert(packs.map(_._4).sum == total)

    // each doc's segments are contiguous from 1 to its token count
    packs.groupBy(_._2).foreach { case (docId, segs) =>
      val sorted = segs.sortBy(_._1)
      var next = 1L
      sorted.foreach { case (_, _, segStart, segTok) =>
        assert(segStart == next, s"doc $docId gap at $segStart (want $next)")
        next += segTok
      }
      assert(next - 1 == (docId / 3 % 7) + 1)
    }
  }

  test("bucketSize does not change the result (two-phase prefix is exact)") {
    val a = Packing.packSequences(docs, capacity = 4, bucketSize = 1L)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Packing.packSequences(docs, capacity = 4, bucketSize = 1000L)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  private def wordDoc(id: Long, n: Int) = (id, ("w " * n).trim)

  test("binPack: hand-computed next-fit within a bucket, overlong doc truncated") {
    import spark.implicits._
    val df = Seq(wordDoc(0L, 6), wordDoc(1L, 5), wordDoc(2L, 4),
      wordDoc(3L, 2), wordDoc(4L, 7), wordDoc(5L, 15))
      .toDF("doc_id", "text")
    val got = Packing.binPack(df, capacity = 10, bucketSize = 4L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("seg_tokens"), r.getAs[Long]("bin_id"))).toMap
    // bucket 0 (ids 0-3): [6]->bin0, [5,4]->bin1 (5+4=9<=10), [2]->bin2
    assert(got(0L) == (6L, 0L))
    assert(got(1L) == (5L, 1L) && got(2L) == (4L, 1L))
    assert(got(3L) == (2L, 2L))
    // bucket 1 starts fresh; the 15-token doc truncates to capacity
    assert(got(4L) == (7L, 4L))
    assert(got(5L) == (10L, 5L)) // 7+10>10 -> next bin
  }

  test("binPack is invariant under input partitioning (bucket-local fold)") {
    import spark.implicits._
    val df = (0L until 50L).map(i => wordDoc(i, 1 + (i % 9).toInt))
      .toDF("doc_id", "text")
    val a = Packing.binPack(df).collect().map(_.toSeq).sortBy(_.toString)
    val b = Packing.binPack(df.repartition(7)).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("binPackStats: fills sum to the packed tokens, waste complements capacity") {
    import spark.implicits._
    val df = Seq(wordDoc(0L, 6), wordDoc(1L, 5), wordDoc(2L, 4), wordDoc(3L, 2))
      .toDF("doc_id", "text")
    val got = Packing.binPackStats(df, capacity = 10, bucketSize = 4L)
      .collect().map(r => r.getAs[Long]("bin_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("used_tokens"),
          r.getAs[Long]("waste_tokens"), r.getAs[Long]("fill_pm"))).toMap
    assert(got(0L) == (1L, 6L, 4L, 600L))
    assert(got(1L) == (2L, 9L, 1L, 900L))
    assert(got(2L) == (1L, 2L, 8L, 200L))
  }
}
