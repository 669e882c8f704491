package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Incremental near-duplicate admission for a streaming document feed
  * (SURVEY §2.10 extension): each micro-batch's documents are simhashed and
  * band-joined against the ACCUMULATED corpus index; in-batch and
  * cross-batch near-dups (Hamming ≤ maxHamming) are rejected, survivors are
  * appended to the corpus along with their band index rows.
  *
  * This is the arrival-time shape of [[graft.operators.Dedup]]'s batch
  * near-dup pass — the pattern a training-data ingest runs so the corpus
  * stays deduplicated continuously instead of re-sweeping it:
  *   - the index is (band, bv, simhash, id) rows in parquet, so the
  *     candidate probe is the same hash-partitioned equi-join as the batch
  *     operator (pigeonhole recall guarantee included) — never a scan of
  *     the corpus text;
  *   - per batch, work is O(batch × colliding-bucket width), not O(corpus);
  *   - admission is deterministic: lowest id wins among in-batch
  *     near-dup groups (min-id representative, like [[Dedup.exact]]).
  */
object DocStream {

  private val nBandsFor: Int => Int = maxHamming => maxHamming + 1

  /** One micro-batch of admission against (and update of) `indexDir`.
    * Returns the admitted (doc_id, text) rows. Exposed for direct batch use
    * and reused by [[run]]'s foreachBatch. */
  def admitBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
                 maxHamming: Int = 3): DataFrame = {
    val nBands = nBandsFor(maxHamming)
    val bounds = (0 to nBands).map(i => i * 64 / nBands)
    val bandStructs = (0 until nBands).map { i =>
      val lo = bounds(i)
      val w = bounds(i + 1) - lo
      val mask = if (w == 64) -1L else (1L << w) - 1
      struct(lit(i).as("band"),
        shiftright(col("simhash"), lo).bitwiseAND(lit(mask)).as("bv"))
    }

    // simhash + bands for the incoming docs, staged once (consumed twice)
    val incoming = Dedup.simhash(batch, "doc_id", "text")
      .select(col("id"), col("simhash"),
        explode(array(bandStructs: _*)).as("e"))
      .select(col("id"), col("simhash"),
        col("e.band").as("band"), col("e.bv").as("bv"))
      .localCheckpoint(true)

    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val index: DataFrame =
      if (fs.exists(new Path(indexDir))) spark.read.parquet(indexDir)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), incoming.schema)

    // cross-batch rejects: any band collision with the corpus within range
    val vsCorpus = incoming.as("n").join(index.as("o"),
        col("n.band") === col("o.band") && col("n.bv") === col("o.bv"))
      .where(bit_count(col("n.simhash").bitwiseXOR(col("o.simhash")))
        <= maxHamming)
      .select(col("n.id").as("id")).distinct()

    // in-batch rejects: near-dup pairs among the survivors → keep min id
    val inBatch = incoming.join(vsCorpus, Seq("id"), "left_anti")
    val pairRejects = inBatch.as("x").join(inBatch.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.id") < col("y.id"))
      .where(bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
        <= maxHamming)
      .select(col("y.id").as("id")).distinct() // the larger id loses

    val admittedIds = inBatch.select(col("id")).distinct()
      .join(pairRejects, Seq("id"), "left_anti")
      .localCheckpoint(true) // consumed twice (index append + result join)

    // append the admitted docs' band rows to the corpus index
    incoming.join(admittedIds, "id")
      .write.mode("append").parquet(indexDir)

    batch.join(admittedIds.withColumnRenamed("id", "doc_id"), "doc_id")
  }

  /** Streaming wrapper: JSON-lines docs land in `stagingDir`; each
    * micro-batch is admitted against the shared index and survivors are
    * appended to `outDir` as parquet. */
  def run(spark: SparkSession, stagingDir: String, indexDir: String,
          outDir: String, checkpointDir: String,
          maxHamming: Int = 3): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(schema).json(stagingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatch(spark, batch.dropDuplicates("doc_id"), indexDir, maxHamming)
          .write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
