package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.Sessions

/** Base: one shared local session per JVM (suites run in one forked
  * JVM, so getOrCreate dedups). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)
}
