package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite (lazy), UTC, small
  * shuffle fan-out. */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session

  /** First file under `dir` whose name ends with `suffix` — closes the
    * directory stream (a bare Files.list(...).findFirst leaks it). */
  protected def firstFile(dir: java.nio.file.Path,
      suffix: String = ".parquet"): java.nio.file.Path = {
    val s = java.nio.file.Files.list(dir)
    try s.filter(_.toString.endsWith(suffix)).findFirst.get
    finally s.close()
  }
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS); set once at construction
      // so read accessors stay side-effect-free (see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
