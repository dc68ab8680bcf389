package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity._

/** The missing lifecycle half of the ANN stack: [[Similarity.ivfTopK]]
  * rebuilds centroids and cell assignments inside every query plan,
  * which is right for an oracle-checked one-shot and wrong for a real
  * corpus — at 100 TB the assignment pass IS the expensive step (one
  * broadcast-join scan of every vector), and a production index builds
  * it ONCE and serves many query batches from the stored layout.
  *
  * [[build]] persists the two halves of the IVF index through
  * [[graft.sources.Bucketed]]:
  *   - `<name>_centroids` — (cent_id, cv, cnrm), parameter-sized;
  *   - `<name>_cells` — every corpus vector with its assigned cell,
  *     BUCKETED on cent_id: the probe join's key is the physical
  *     layout, so serving reads arrive pre-clustered by cell (and a
  *     `cent_id` filter bucket-prunes — a 1-probe query over a
  *     16-cell/8-bucket index touches 1/8 of the files).
  *
  * [[query]] answers top-k from the stored tables alone — no
  * re-quantization, no re-assignment, no corpus scan beyond the probed
  * cells — and matches the in-memory [[Similarity.ivfTopK]] results
  * exactly (AnnIndexSpec pins the equality, build → disk → query).
  */
object AnnIndex {

  def centroidsTable(name: String): String = name + "_centroids"
  def cellsTable(name: String): String = name + "_cells"

  /** Build and persist the index: quantize, (optionally Lloyd-refine)
    * the first-`nCentroids` seed centroids, assign every vector to its
    * max-cosine cell, and store both tables — the one corpus-sized pass
    * this index ever pays. */
  def build(embeddings: DataFrame, name: String, nCentroids: Int = 16,
            refineIters: Int = 0, buckets: Int = 8): Unit = {
    val vecs = embeddings
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("nrm", sqrt(norm2Q(col("qv")).cast("double")))
    val seeds = vecs.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("qv").as("cv"), col("nrm").as("cnrm"))
    val cents = (1 to refineIters).foldLeft(seeds)((c, _) => refinedCentroids(vecs, c))
    cents.write.mode("overwrite").format("parquet")
      .saveAsTable(centroidsTable(name))
    // assignment against the STORED centroids, so the two tables can
    // never disagree about a cell boundary
    val spark = embeddings.sparkSession
    val assigned = assignCells(vecs, spark.table(centroidsTable(name)))
      .select("vec_id", "qv", "nrm", "cent_id")
    graft.sources.Bucketed.writeBucketed(
      assigned, cellsTable(name), "cent_id", buckets)
  }

  /** Serve top-k from the stored index: rank each query vector's
    * `nprobe` nearest stored centroids (query set is tiny — the window
    * is fine), then scan only the probed cells through the bounded
    * [[Similarity.TopKAgg]]. Identical arithmetic to the in-memory
    * path ⇒ identical results. */
  def query(spark: SparkSession, name: String, nQueries: Int = 5,
            k: Int = 10, nprobe: Int = 1): DataFrame = {
    val cents = spark.table(centroidsTable(name))
    val cells = spark.table(cellsTable(name))
    val byVec = Window.partitionBy("vec_id")
      .orderBy(col("cos_c").desc, col("cent_id"))
    val probes = cells.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("qv"), col("nrm"))
      .join(broadcast(cents))
      .select(col("vec_id"), col("qv"), col("nrm"), col("cent_id"),
        (dotQ(col("qv"), col("cv")).cast("double") / (col("nrm") * col("cnrm")))
          .as("cos_c"))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("nrm").as("qnrm"), col("cent_id").as("qcent"))
    val probed = cells.join(broadcast(probes),
        col("cent_id") === col("qcent") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dotQ(col("qqv"), col("qv")).cast("double") / (col("qnrm") * col("nrm")))
          .as("cos"))
    topKByQuery(probed, k)
  }
}
