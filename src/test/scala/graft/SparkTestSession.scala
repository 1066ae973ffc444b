package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** Shared local SparkSession fixture for operator specs. */
trait SparkTestSession extends BeforeAndAfterAll { self: Suite =>
  @transient lazy val spark: SparkSession =
    Tables.configure(SparkSession.builder().master("local[4]").appName("graft-test"), "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()

  override def afterAll(): Unit = {
    // keep the session for the other suites in the same JVM (forked once)
    super.afterAll()
  }
}
