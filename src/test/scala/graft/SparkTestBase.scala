package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per forked test JVM. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("graft-test", "4")
}
