package graft.tools

import java.nio.file.{Files, Paths}
import graft.{GraftSession, SparkEntry}

/** Single-query slice of Verify — dumps one gate query's result plus a
  * one-entry oracle_sql.json so `tools/check_oracle.py` can compare it
  * alone. The fast loop when authoring a new gate (full Verify is
  * ~3 min over 99 queries).
  *
  * Usage: runMain graft.tools.QCheck <query> [sfDir] [outDir]
  */
object QCheck {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/qcheck"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "qcheck")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    import graft.OracleJson.{quote => q}
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      s"{${q(name)}: ${q(SparkEntry.oracleSql(name))}}")
    println(s"dumped $name")
    spark.stop()
  }
}
