package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs; mirrors the driver's Verify config. */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the library's declarative integration path — suites run on an
    // extensions-injected session like an external user's cluster would
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .appName("graft-test")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // shared across suites in one forked JVM — do not stop
    super.afterAll()
  }
}
