package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; Spark reuses
  * the active session across getOrCreate calls).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Graft.localSession(cores = 4, shufflePartitions = 4)

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
