package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.ScalaReflection
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.model.MaterializedDay

/** Staged-ingest source for day documents (the engine-side stand-in for the
  * reference's network scraper S1, SURVEY §2.1): the fetcher — whatever it
  * is — lands one JSON object per line, and this source turns the staging
  * area into a typed `Dataset[MaterializedDay]`.
  *
  * At scale this is the right seam: per-date fan-out fetching (the
  * reference's `task.map`) becomes however-many files in the staging dir,
  * and the JSON-lines scan parallelizes by file split — no driver-side
  * iteration anywhere.
  */
object DaySource {

  val daySchema: StructType =
    ScalaReflection.schemaFor[MaterializedDay].dataType.asInstanceOf[StructType]

  /** Read staged JSON-lines days. Malformed lines fail the job by default
    * (mode=FAILFAST) — silent drops would defeat change detection. */
  def readJsonl(spark: SparkSession, path: String,
                failFast: Boolean = true): Dataset[MaterializedDay] = {
    import spark.implicits._
    spark.read
      .schema(daySchema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)
      .select(daySchema.fieldNames.map(col): _*)
      .as[MaterializedDay]
  }

  /** Stage a dataset of days as JSON-lines (the fetcher's write side; also
    * used by tests to round-trip). */
  def writeJsonl(days: Dataset[MaterializedDay], path: String): Unit =
    days.toDF().write.mode("overwrite").json(path)
}
