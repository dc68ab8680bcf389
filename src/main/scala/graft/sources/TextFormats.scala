package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-format ingest coverage: CSV and JSON-lines paths with the
  * disciplines a 100 TB lake enforces, proven by write→read→compare
  * roundtrips against the parquet ground truth (the DuckDB oracle
  * reads the parquet side, so a roundtrip query IS a full value-level
  * equality check of the format codec):
  *
  *   - **explicit schema on read, always** — schema inference is an
  *     extra full pass over the data AND a drift hazard (a single new
  *     malformed cell silently retypes a column for the whole read);
  *     at scale the schema is a contract, not a guess;
  *   - **header validation on, locality-independent rendering** —
  *     timestamps/dates would pin a format + UTC (these dims carry
  *     none, which is why they are the roundtrip subjects);
  *   - **corrupt records surface, never kill the job** — PERMISSIVE
  *     mode with a named corrupt-record column, counted and reported
  *     (spec-pinned in TextFormatsSpec; the 1-bad-row-fails-the-batch
  *     alternative is how a 100 TB backfill dies at hour 9).
  *
  * The file-writing roundtrips use the small dimension tables (the
  * write is a test harness, not the operator under test — the READ
  * path is); the columnar to_json/from_json roundtrip runs over the
  * full documents table with zero file IO and stays entirely inside
  * whole-stage codegen.
  */
object TextFormats {

  /** ONE JVM-scoped scratch root, deleted on exit: the roundtrips write
    * with mode=overwrite to fixed subpaths, so a 200-query bench loop
    * rewrites the same two table copies instead of accreting a fresh
    * /tmp directory per invocation (the returned read plan is lazy —
    * the files must outlive this call, which rules out delete-on-return;
    * the shutdown hook is the correct lifetime). */
  private lazy val scratchRoot: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft_textfmt")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm))
        p.delete(): Unit
      }
      rm(dir.toFile)
    }))
    dir
  }

  /** A fresh unique scratch subdirectory under the shutdown-hooked
    * root — for callers whose write mode is append (reusing one path
    * would accrete rows across invocations), so their per-call dirs
    * still get reclaimed at JVM exit instead of leaking into /tmp. */
  def freshScratchDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(scratchRoot, prefix).toString

  /** CSV write→read roundtrip over nation: explicit schema + header.
    * Returning the read-back frame makes the oracle compare every
    * value that survived the text codec. */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.nation(spark, sfDir)
    val dir = scratchRoot.resolve("csv_nation").toString
    src.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(dir)
    spark.read.schema(src.schema).option("header", "true")
      .option("enforceSchema", "false") // validate the header, not trust it
      .csv(dir)
  }

  /** JSON-lines write→read roundtrip over supplier (doubles included:
    * Spark writes shortest-roundtrip doubles, so read-back is
    * bit-exact). */
  def jsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.supplier(spark, sfDir)
    val dir = scratchRoot.resolve("json_supplier").toString
    src.coalesce(1).write.mode("overwrite").json(dir)
    spark.read.schema(src.schema).json(dir)
  }

  /** ORC write→read roundtrip over customer — the OTHER columnar lake
    * format Spark ships natively, exercised with an explicit
    * compression codec (zstd) so the full encode→compress→decode→
    * decode path is value-checked, doubles included. Unlike the text
    * formats there is no schema-inference hazard (ORC files carry
    * their schema), so the discipline pinned here is simpler: the
    * read-back must be VALUE-identical to the parquet ground truth
    * the oracle reads — any codec/type-mapping divergence (e.g.
    * decimal/char widening) hash-mismatches. */
  def orcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val dir = scratchRoot.resolve("orc_customer").toString
    src.write.mode("overwrite").option("compression", "zstd").orc(dir)
    spark.read.orc(dir)
  }

  /** SCHEMA EVOLUTION read: two writer generations of the same table —
    * generation 1 without a column the pipeline later added, generation
    * 2 with it — read back as ONE relation with `mergeSchema`, the
    * lake-maintenance fact every long-lived dataset hits (a backfill
    * can't rewrite 100 TB of history to add a column; the READER must
    * reconcile). Generation 1's missing `c_mktsegment` surfaces as
    * NULL, exactly like the oracle's UNION-with-NULLs restatement, and
    * the `gen` column proves both generations arrived. mergeSchema is
    * asked for EXPLICITLY per read (the global default stays off — a
    * footer-merge pass over every file is not a cost to pay silently
    * at scale). */
  def schemaEvolutionRead(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.customer(spark, sfDir)
    val dir = scratchRoot.resolve("evolve_customer").toString
    src.select(col("c_custkey"), col("c_name"), lit(1L).as("gen"))
      .write.mode("overwrite").parquet(s"$dir/gen=1")
    src.select(col("c_custkey"), col("c_name"), lit(2L).as("gen"),
        col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/gen=2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/gen=1", s"$dir/gen=2")
      .select("c_custkey", "c_name", "gen", "c_mktsegment")
  }

  /** Columnar JSON codec roundtrip over the FULL documents table:
    * to_json(struct(*)) → from_json(schema) → reproject, no file IO —
    * both directions are codegen'd expressions, so this is the shape
    * an event pipeline uses to pack/unpack payload columns in-flight
    * (the `props` column of events is the read half of the same
    * idiom). */
  def jsonColumnRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.documents(spark, sfDir)
    val packed = src.select(to_json(struct(src.columns.map(col): _*))
      .as("js"))
    packed.select(from_json(col("js"), src.schema).as("doc"))
      .select(src.columns.map(c => col(s"doc.$c").as(c)): _*)
  }

  /** PERMISSIVE corrupt-record accounting: parse JSON lines with a
    * named corrupt column; good rows keep their fields, bad rows keep
    * their raw text — nothing throws. Returns (n_good, n_bad,
    * n_rows). */
  def corruptRecordStats(lines: DataFrame, schemaDdl: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      schemaDdl + ", _corrupt STRING")
    lines
      .select(from_json(col("value"), schema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("r"))
      .agg(
        sum(when(col("r._corrupt").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("r._corrupt").isNotNull, 1L).otherwise(0L)).as("n_bad"),
        count(lit(1)).as("n_rows"))
  }
}
