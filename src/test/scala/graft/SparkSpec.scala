package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs (UTC, ANSI default ON as in the
  * driver's sessions, nanos-as-long for the events table).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // shared session, do not stop
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.local(4)
      .config("spark.sql.warehouse.dir", TempDirs.create("graft-wh"))
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
