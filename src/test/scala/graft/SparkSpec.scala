package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sqlImplicits = spark.implicits

  /** Wait for a persisted index's streaming-ingest lease to release:
    * ingestStream holds .MAINT_LEASE for the query's lifetime and a
    * daemon deletes it within ~1 s of termination — maintenance ops
    * right after q.stop() poll here instead of racing the release.
    */
  def awaitLeaseRelease(dir: String, timeoutMs: Long = 15000): Unit = {
    val lease = new java.io.File(dir, ".MAINT_LEASE")
    val deadline = System.currentTimeMillis() + timeoutMs
    while (lease.exists() && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(!lease.exists(),
      s"stream lease at $lease not released within ${timeoutMs}ms")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.rangeJoin.binWidth", "auto")
      .config("spark.graft.aggJoinToWindow", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
