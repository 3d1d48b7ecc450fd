package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide SparkSession).
  *
  * Each suite's afterAll drops every cached/persisted block (operator-level
  * caches like Dedup's pair outputs, localCheckpoint blocks from
  * Dedup.clusters) so storage memory doesn't accumulate across the 15
  * suites sharing this JVM.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"

  override protected def afterAll(): Unit = {
    try {
      val s = SparkSpec.session
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    } finally super.afterAll()
  }
}

/** Deterministic scalacheck sampling shared by the property specs: one
  * generator draw per explicit seed — reproducible failures, no shrink
  * nondeterminism across the shared-JVM suites. */
trait PropertySampling {
  private val params = org.scalacheck.Gen.Parameters.default
  protected def sample[T](g: org.scalacheck.Gen[T], seed: Long): T =
    g.pureApply(params, org.scalacheck.rng.Seed(seed))
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
