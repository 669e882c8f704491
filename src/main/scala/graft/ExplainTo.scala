package graft

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for a named list of catalog queries to
  * per-query files — the plan evidence for the optimization rounds
  * (plans/r17/<query>_before.txt / _after.txt). Usage:
  *   sbt "runMain graft.ExplainTo <sfDir> <outDir> <suffix> q19_...,q22_..."
  *
  * Matches the bench's session shape (local[SPARK_GRAFT_CPUS], shuffle
  * partitions = cores) so the dumped initial plans are the ones the bench
  * executes (AQE's runtime rewrites are captured separately by the bench's
  * SPARK_GRAFT_PLANS executed-plan dump).
  */
object ExplainTo {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: ExplainTo <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name$suffix.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println(s"wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
