package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session via
  * getOrCreate; build.sbt forks tests with the JDK17 add-opens).
  *
  * Every suite drains [[graft.queries.ScratchCache]] on teardown: queries
  * register their scratch persists there expecting the CALLER to release
  * them after the terminal action (Verify and Bench drain per query), and
  * a suite that exercised the query map without draining would pin those
  * Datasets — and transitively the session — in executor storage for the
  * life of the test JVM (round-6 advice).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override protected def afterAll(): Unit = {
    graft.queries.ScratchCache.drain()
    super.afterAll()
  }
}
